"""LM training launcher (reference: src/bin/lm_train.py)."""

from cassnat_asr_public_tpu.bin.parser import base_parser
from cassnat_asr_public_tpu.parallel.mesh import distributed_init
from cassnat_asr_public_tpu.utils.config import dump_config, merge_configs


def main(argv=None):
    p = base_parser()
    args = p.parse_args(argv)
    cfg = merge_configs(args, args.train_config, args.data_config)
    cfg.task = "lm"
    distributed_init()
    dump_config(cfg, cfg.exp_dir)
    from cassnat_asr_public_tpu.tasks import LMTask
    LMTask("train", cfg).run(cfg)


if __name__ == "__main__":
    main()
