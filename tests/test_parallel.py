"""SPMD sharding tests on a virtual 8-device CPU mesh.

The axon sitecustomize initializes a single-device CPU client at interpreter
startup, so multi-device tests must run in a clean subprocess with
xla_force_host_platform_device_count=8 (SURVEY.md §4).
"""

import os
import subprocess
import sys

SCRIPT = '\n\nimport numpy as np\nimport jax\nimport jax.numpy as jnp\nfrom jax.sharding import PartitionSpec as P\n\nfrom cassnat_asr_public_tpu.parallel.mesh import (\n    batch_sharding,\n    make_mesh,\n    param_sharding_rules,\n    replicated,\n)\nfrom cassnat_asr_public_tpu.models import make_cassnat\nimport sys, os\nsys.path.insert(0, os.environ["REPO_TESTS"])\nfrom test_models import batch, tiny_args, VOCAB\n\n\ndef test_eight_devices_available():\n    assert len(jax.devices()) == 8\n\n\ndef test_mesh_shapes():\n    mesh = make_mesh()\n    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1\n    mesh2 = make_mesh(data=4, model=2)\n    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2\n\n\ndef test_dp_loss_matches_single_device(rng):\n    args = tiny_args(use_conv_enc=False, use_conv_dec=False,\n                     pos_type="absolute")\n    model = make_cassnat(20, args)\n    feats, src_mask, labels, label_sizes = batch(rng, bs=8)\n    tgt_label = labels[:, 1:]\n    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,\n                        tgt_label, label_sizes)\n\n    def loss_fn(p, f, m, t, ls):\n        return model.apply(p, f, m, t, ls)["loss"]\n\n    single = float(jax.jit(loss_fn)(params, feats, src_mask, tgt_label,\n                                    label_sizes))\n\n    mesh = make_mesh()\n    bsh = batch_sharding(mesh)\n    rsh = replicated(mesh)\n    p_sh = jax.device_put(params, rsh)\n    args_sh = [jax.device_put(x, bsh)\n               for x in (feats, src_mask, tgt_label, label_sizes)]\n    sharded = float(jax.jit(loss_fn)(p_sh, *args_sh))\n    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-5)\n\n\ndef test_dp_grads_match_single_device(rng):\n    args = tiny_args(use_conv_enc=False, use_conv_dec=False,\n                     pos_type="absolute")\n    model = make_cassnat(20, args)\n    feats, src_mask, labels, label_sizes = batch(rng, bs=8)\n    tgt_label = labels[:, 1:]\n    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,\n                        tgt_label, label_sizes)\n\n    def loss_fn(p):\n        return model.apply(p, feats, src_mask, tgt_label, label_sizes)["loss"]\n\n    g_single = jax.jit(jax.grad(loss_fn))(params)\n\n    mesh = make_mesh()\n    bsh = batch_sharding(mesh)\n    p_sh = jax.device_put(params, replicated(mesh))\n    f, m, t, ls = (jax.device_put(feats, bsh), jax.device_put(src_mask, bsh),\n                   jax.device_put(tgt_label, bsh),\n                   jax.device_put(label_sizes, bsh))\n\n    def loss_sh(p):\n        return model.apply(p, f, m, t, ls)["loss"]\n\n    g_sharded = jax.jit(jax.grad(loss_sh))(p_sh)\n    for a, b in zip(jax.tree_util.tree_leaves(g_single),\n                    jax.tree_util.tree_leaves(g_sharded)):\n        np.testing.assert_allclose(np.asarray(a), np.asarray(b),\n                                   rtol=5e-4, atol=5e-5)\n\n\ndef test_tensor_parallel_ffn_sharding(rng):\n    """2-way model sharding of FFN/vocab matmuls produces identical results."""\n    args = tiny_args(use_conv_enc=False, use_conv_dec=False,\n                     pos_type="absolute")\n    model = make_cassnat(20, args)\n    feats, src_mask, labels, label_sizes = batch(rng, bs=4)\n    tgt_label = labels[:, 1:]\n    params = model.init({"params": jax.random.PRNGKey(0)}, feats, src_mask,\n                        tgt_label, label_sizes)\n\n    def loss_fn(p):\n        return model.apply(p, feats, src_mask, tgt_label, label_sizes)["loss"]\n\n    single = float(jax.jit(loss_fn)(params))\n\n    mesh = make_mesh(data=4, model=2)\n    rules = param_sharding_rules(params, mesh)\n    p_sh = jax.tree_util.tree_map(jax.device_put, params, rules)\n    tp = float(jax.jit(loss_fn)(p_sh))\n    np.testing.assert_allclose(tp, single, rtol=1e-5, atol=1e-5)\n    # confirm at least one leaf actually got model-sharded\n    specs = jax.tree_util.tree_leaves(\n        jax.tree_util.tree_map(lambda s: s.spec, rules,\n                               is_leaf=lambda x: hasattr(x, "spec")))\n    assert any(spec != P() for spec in specs)\n\n\nimport numpy as _np\n_rng = _np.random.default_rng(0)\ntest_eight_devices_available()\ntest_mesh_shapes()\ntest_dp_loss_matches_single_device(_np.random.default_rng(0))\ntest_dp_grads_match_single_device(_np.random.default_rng(0))\ntest_tensor_parallel_ffn_sharding(_np.random.default_rng(0))\nprint("ALL_OK")\n'


def test_parallel_suite_clean_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["REPO_TESTS"] = os.path.join(repo, "tests")
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + parts)
    res = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, (res.stdout[-1000:], res.stderr[-3000:])
    assert "ALL_OK" in res.stdout
