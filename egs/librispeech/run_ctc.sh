#!/usr/bin/env bash
# CTC-only train/average/decode (reference: egs/librispeech/run_ctc.sh).

. ./path.sh
stage=1
end_stage=3
exp=exp/ctc
data=./data
. $E2EASR/utils/parse_options.sh 2>/dev/null || true
set -euo pipefail

if [ $stage -le 1 ] && [ $end_stage -ge 1 ]; then
  python -m cassnat_asr_public_tpu.bin.train_asr \
    --exp_dir $exp --train_config conf/ctc.yaml \
    --data_config conf/data.yaml --optim_type noam --epochs 100 --task ctc
fi

if [ $stage -le 2 ] && [ $end_stage -ge 2 ]; then
  python $E2EASR/utils/average_checkpoints.py --exp_dir $exp --num 12
fi

if [ $stage -le 3 ] && [ $end_stage -ge 3 ]; then
  for part in test_clean test_other; do
    python -m cassnat_asr_public_tpu.bin.decode_asr \
      --task ctc --test_config conf/ctc_decode.yaml \
      --data_config conf/data.yaml --resume_model $exp/averaged.ckpt \
      --data_path $data/fbank/$part/feats.scp \
      --text_label $data/$part/token_wp.scp \
      --decode_type greedy --batch_size 16 \
      --result_file $exp/hyp_$part.txt
    python $E2EASR/utils/score_wer.py \
      --ref $data/$part/text --hyp $exp/hyp_$part.txt | tee $exp/wer_$part.txt
  done
fi
