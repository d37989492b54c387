#!/usr/bin/env bash
# HubertNAT: fine-tune a fairseq HuBERT encoder with the CASS-NAT decoder
# (reference: egs/librispeech/run_hubert.sh — train, average, ESA decode).

. ./path.sh
stage=1
end_stage=3
exp=exp/hubert_nat
hubert_ckpt=downloads/hubert_base_ls960.pt
data=./data
. $E2EASR/utils/parse_options.sh 2>/dev/null || true
set -euo pipefail

if [ $stage -le 1 ] && [ $end_stage -ge 1 ]; then
  python -m cassnat_asr_public_tpu.bin.train_asr \
    --exp_dir $exp --train_config conf/hubert_train.yaml \
    --data_config conf/hubert_data.yaml --optim_type noam --epochs 80 \
    --task hubert --resume_model $hubert_ckpt
fi

if [ $stage -le 2 ] && [ $end_stage -ge 2 ]; then
  python $E2EASR/utils/average_checkpoints.py --exp_dir $exp --num 10
fi

if [ $stage -le 3 ] && [ $end_stage -ge 3 ]; then
  for part in test_clean test_other; do
    python -m cassnat_asr_public_tpu.bin.decode_asr \
      --task hubert --test_config conf/hubert_decode.yaml \
      --data_config conf/hubert_data.yaml \
      --resume_model $exp/averaged.ckpt \
      --data_path $data/$part/wav_s.scp \
      --text_label $data/$part/token_wp.scp \
      --decode_type esa_att --batch_size 8 \
      --result_file $exp/hyp_$part.txt
    python $E2EASR/utils/score_wer.py \
      --ref $data/$part/text --hyp $exp/hyp_$part.txt | tee $exp/wer_$part.txt
  done
fi
