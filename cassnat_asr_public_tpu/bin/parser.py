"""CLI argument surface mirroring the reference
(reference: src/utils/parser.py:6-54)."""

import argparse


def base_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native CASS-NAT ASR training")
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--train_config", required=True)
    p.add_argument("--data_config", required=True)
    p.add_argument("--task", default="art",
                   choices=["art", "cassnat", "ctc", "lm", "lmnat",
                            "lmnat2", "lmnat3", "hubert", "wav2vec"])
    p.add_argument("--optim_type", default="noam")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--start_saving_epoch", type=int, default=1)
    p.add_argument("--end_patience", type=int, default=10)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--print_freq", type=int, default=100)
    p.add_argument("--resume_model", default="")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--pipeline_parallel", type=int, default=1)
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches (0 = pipe-stage count)")
    return p


def decode_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native CASS-NAT ASR decoding")
    p.add_argument("--test_config", required=True)
    p.add_argument("--data_config", required=True)
    p.add_argument("--task", default="art")
    p.add_argument("--lm_config", default=None)
    p.add_argument("--rank_config", default=None)
    p.add_argument("--data_path", default=None)
    p.add_argument("--text_label", default=None)
    p.add_argument("--resume_model", required=True)
    p.add_argument("--rnnlm", default=None)
    p.add_argument("--rank_model_path", default=None)
    p.add_argument("--lm_weight", type=float, default=0.0)
    p.add_argument("--decode_type", default=None)
    p.add_argument("--result_file", default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--print_freq", type=int, default=100)
    return p
