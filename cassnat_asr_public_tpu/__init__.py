"""cassnat_asr_public_tpu — a TPU-native (JAX/XLA/Pallas/pjit) end-to-end speech
recognition framework with the capabilities of balaji1312/cassnat_asr_public.

Built from scratch for TPU: SPMD data/model parallelism over `jax.sharding.Mesh`,
functional train/decode steps under `jax.jit`, `lax.scan`-based CTC dynamic
programs, and Pallas kernels for the hot ops.

Layering (bottom-up):
  ops/       pure jittable array ops: CTC loss / Viterbi alignment / trigger
             masks / prefix scoring, log-mel frontend, SpecAugment, edit distance
  kernels/   Pallas TPU kernels (fused attention, CTC scans)
  nn/        flax.linen modules (attention, conformer, embeddings, blocks)
  models/    model families: AST transformer/conformer, CTC, CASS-NAT, LM,
             LMNAT*, HubertNAT, wav2vec2 SSL
  parallel/  mesh + sharding helpers, distributed init, collective metrics
  data/      manifests (Kaldi scp/ark compatible), tokenizer, vocab, batching
  utils/     schedules, checkpointing, metrics, config
  tasks/     training / decoding drivers per model family
  bin/       CLI entry points (train_asr, decode_asr, lm_train, train_ssl)
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: compiles through the remote-TPU tunnel
# in this harness are slow and high-variance (observed 20s-8min for the same
# module), so cache aggressively by default. Opt out / redirect with
# CASSNAT_COMPILATION_CACHE=off|<dir>.
import os as _os

_cache = _os.environ.get("CASSNAT_COMPILATION_CACHE", "/tmp/jax_comp_cache")
# CPU-only processes (tests, the virtual-mesh dryrun) skip the cache: XLA:CPU
# AOT results are machine-feature-pinned and reloading them across the
# axon-pinned vs clean environments warns about potential SIGILL.
if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
    _cache = "off"
if _cache != "off":
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # pragma: no cover - jax always present in practice
        pass
del _os
