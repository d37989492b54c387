#!/usr/bin/env bash
# AST training + decoding pipeline (reference: egs/librispeech/run_art.sh).
# Stage 0: LM training; Stage 1: AST training; Stage 2: checkpoint
# averaging; Stage 3: batched beam decoding + in-framework WER scoring
# (replaces nj-sharded per-GPU decoding + sclite).

. ./path.sh

stage=1
end_stage=3
exp=exp/art_transformer
lm_exp=exp/lm
data=./data

. $E2EASR/utils/parse_options.sh 2>/dev/null || true
set -euo pipefail

if [ $stage -le 0 ] && [ $end_stage -ge 0 ]; then
  python -m cassnat_asr_public_tpu.bin.lm_train \
    --exp_dir $lm_exp --train_config conf/lm.yaml \
    --data_config conf/lm_data.yaml --optim_type noam --epochs 30 --task lm
fi

if [ $stage -le 1 ] && [ $end_stage -ge 1 ]; then
  python -m cassnat_asr_public_tpu.bin.train_asr \
    --exp_dir $exp --train_config conf/transformer.yaml \
    --data_config conf/data.yaml --optim_type noam --epochs 120 \
    --task art --start_saving_epoch 60 --end_patience 15
fi

if [ $stage -le 2 ] && [ $end_stage -ge 2 ]; then
  python $E2EASR/utils/average_checkpoints.py --exp_dir $exp --num 12
fi

if [ $stage -le 3 ] && [ $end_stage -ge 3 ]; then
  for part in test_clean test_other; do
    python -m cassnat_asr_public_tpu.bin.decode_asr \
      --task art --test_config conf/decode.yaml --data_config conf/data.yaml \
      --resume_model $exp/averaged.ckpt \
      --data_path $data/fbank/$part/feats.scp \
      --text_label $data/$part/token_wp.scp \
      --decode_type ctc_att --batch_size 8 \
      --result_file $exp/hyp_$part.txt
    python $E2EASR/utils/score_wer.py \
      --ref $data/$part/text --hyp $exp/hyp_$part.txt | tee $exp/wer_$part.txt
  done
fi
