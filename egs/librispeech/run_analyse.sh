#!/usr/bin/env bash
# CASS-NAT analysis: embedding dumps + alignment hitrate + utt2diff.
# (reference: egs/librispeech/run_analyse.sh -> src/bin/cassnat_analyze.py)

. ./path.sh
exp=exp/cassnat_conformer
out=analysis
. $E2EASR/utils/parse_options.sh 2>/dev/null || true
set -euo pipefail

python -m cassnat_asr_public_tpu.bin.cassnat_analyze \
  --test_config conf/cassnat_decode.yaml --data_config conf/data.yaml \
  --resume_model $exp/averaged.ckpt --out_dir $out --save_embedding
