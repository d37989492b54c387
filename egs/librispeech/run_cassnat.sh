#!/usr/bin/env bash
# CASS-NAT training + ESA decoding (reference: egs/librispeech/run_art.sh
# stages for the NAT model + conf/cassnat_*.yaml).

. ./path.sh

stage=1
end_stage=3
exp=exp/cassnat_conformer
art_exp=exp/art_transformer
data=./data

. $E2EASR/utils/parse_options.sh 2>/dev/null || true
set -euo pipefail

if [ $stage -le 1 ] && [ $end_stage -ge 1 ]; then
  # encoder initialized from the AST checkpoint (model surgery)
  python -m cassnat_asr_public_tpu.bin.train_asr \
    --exp_dir $exp --train_config conf/cassnat_train.yaml \
    --data_config conf/data.yaml --optim_type noam --epochs 120 \
    --task cassnat --start_saving_epoch 60 --end_patience 15 \
    --resume_model $art_exp/averaged.ckpt
fi

if [ $stage -le 2 ] && [ $end_stage -ge 2 ]; then
  python $E2EASR/utils/average_checkpoints.py --exp_dir $exp --num 12
fi

if [ $stage -le 3 ] && [ $end_stage -ge 3 ]; then
  for part in test_clean test_other; do
    python -m cassnat_asr_public_tpu.bin.decode_asr \
      --task cassnat --test_config conf/cassnat_decode.yaml \
      --data_config conf/data.yaml \
      --resume_model $exp/averaged.ckpt \
      --data_path $data/fbank/$part/feats.scp \
      --text_label $data/$part/token_wp.scp \
      --decode_type esa_att --batch_size 16 \
      --result_file $exp/hyp_$part.txt
    python $E2EASR/utils/score_wer.py \
      --ref $data/$part/text --hyp $exp/hyp_$part.txt | tee $exp/wer_$part.txt
  done
fi
