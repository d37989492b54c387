"""Batch decoding launcher.

(reference: src/bin/decode_asr.py — build test task, load LM, decode, write
hypothesis text for scoring.)
"""

import sys
import time

from cassnat_asr_public_tpu.bin.parser import decode_parser
from cassnat_asr_public_tpu.data.vocab import pieces_to_text
from cassnat_asr_public_tpu.utils.config import merge_configs


def main(argv=None):
    args = decode_parser().parse_args(argv)
    cfg = merge_configs(args, args.test_config, args.data_config)
    if args.decode_type:
        cfg.decode_type = args.decode_type
    if args.data_path:  # test-path injection (reference: decode_asr.py:27-30)
        cfg.test_paths = [{"name": "test", "scp_path": args.data_path,
                           **({"text_label": args.text_label}
                              if args.text_label else {})}]
    cfg.test_batch_size = args.batch_size

    from cassnat_asr_public_tpu.tasks import TASKS
    task = TASKS[cfg.task]("test", cfg)
    task.load_lm_model(cfg)
    results, elapsed = task.decode(cfg)
    out_path = args.result_file or "hyp.txt"
    with open(out_path, "w") as f:
        for utt, words in results.items():
            text = pieces_to_text(words)
            f.write(f"{utt} {text}\n")
    print(f"Decoded {len(results)} utts in {elapsed:.2f}s -> {out_path}",
          flush=True)


if __name__ == "__main__":
    main()
