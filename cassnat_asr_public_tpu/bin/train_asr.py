"""ASR training launcher.

(reference: src/bin/train_asr.py — YAML merge onto argparse namespace,
resolved-config dump, task dispatch. DDP mp.spawn/SLURM plumbing is replaced
by jax.distributed + SPMD: one process per host, all local devices used
automatically.)
"""

import sys

import jax

from cassnat_asr_public_tpu.bin.parser import base_parser
from cassnat_asr_public_tpu.parallel.mesh import distributed_init
from cassnat_asr_public_tpu.utils.config import dump_config, merge_configs


def main(argv=None):
    args = base_parser().parse_args(argv)
    cfg = merge_configs(args, args.train_config, args.data_config)
    distributed_init()
    if jax.process_index() == 0:
        dump_config(cfg, cfg.exp_dir)

    from cassnat_asr_public_tpu.tasks import TASKS
    task_cls = TASKS.get(cfg.task)
    if task_cls is None:
        raise NotImplementedError(f"task {cfg.task} not available yet")
    task = task_cls("train", cfg)
    task.run(cfg)


if __name__ == "__main__":
    main()
