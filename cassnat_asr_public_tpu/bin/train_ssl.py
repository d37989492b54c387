"""SSL (wav2vec2) training launcher (reference: src/bin/train_ssl.py)."""

from cassnat_asr_public_tpu.bin.parser import base_parser
from cassnat_asr_public_tpu.parallel.mesh import distributed_init
from cassnat_asr_public_tpu.utils.config import dump_config, merge_configs


def main(argv=None):
    args = base_parser().parse_args(argv)
    cfg = merge_configs(args, args.train_config, args.data_config)
    cfg.task = "wav2vec"
    distributed_init()
    dump_config(cfg, cfg.exp_dir)
    from cassnat_asr_public_tpu.tasks import Wav2vecTask
    Wav2vecTask("train", cfg).run(cfg)


if __name__ == "__main__":
    main()
