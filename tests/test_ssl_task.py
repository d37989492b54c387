"""wav2vec SSL task end-to-end smoke on the toy corpus."""

import os

import numpy as np

from cassnat_asr_public_tpu.utils.config import Config
from tests.test_data import make_toy_corpus


def test_wav2vec_task_trains(tmp_path, rng):
    from cassnat_asr_public_tpu.tasks import Wav2vecTask
    dp, vocab_file, _ = make_toy_corpus(str(tmp_path), n_utts=8, rng=rng)
    args = Config(
        exp_dir=os.path.join(str(tmp_path), "exp_ssl"), task="wav2vec",
        vocab_file=vocab_file, input_size=24, model_type="transformer",
        N_enc=2, d_model=32, d_ff=64, d_encff=48, n_head=4, dropout=0.0,
        enc_kernel_size=7, enc_max_relative_len=4, pos_type="absolute",
        share_ff=False,
        mask_prob=0.5, mask_length=2, num_negatives=4, logit_temp=0.1,
        final_dim=16, quantize_targets=True, latent_vars=8, latent_groups=2,
        left_ctx=0, right_ctx=2, skip_frame=1, use_specaug=False,
        specaug_conf=None, use_cmvn=False, filter_max=100000, filter_min=0,
        batch_size=4, optim_type="noam", noam_factor=0.01, warmup_steps=5,
        total_steps=100, warmup_type="noam_warmup", learning_rate=1e-3,
        weight_decay=0.0, grad_clip=5.0, accum_grad=1,
        epochs=2, start_saving_epoch=0, end_patience=5, seed=0,
        print_freq=1000, resume_model="", model_parallel=1,
        train_paths=[dp], dev_paths=[dp],
    )
    task = Wav2vecTask("train", args)
    task.build_steps()
    m0 = task.run_one_epoch(0, args, is_train=True)
    m1 = task.run_one_epoch(1, args, is_train=True)
    assert np.isfinite(m1["loss"].avg)
    # accuracy metric is tracked
    assert 0.0 <= m1["acc"].avg <= 1.0
