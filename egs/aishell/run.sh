#!/usr/bin/env bash
# Aishell-1 Mandarin char-level AST/NAST recipe (CER scoring).
# Exercises the alternate vocab path (BASELINE.md Aishell numbers).

. ../librispeech/path.sh

stage=1
end_stage=4
exp=exp/aishell_art
data=./data
. $E2EASR/utils/parse_options.sh 2>/dev/null || true
set -euo pipefail

if [ $stage -le 0 ] && [ $end_stage -ge 0 ]; then
  echo "Stage 0: features + char units"
  for part in train dev test; do
    cmvn_flag=""
    [ $part = train ] && cmvn_flag="--cmvn"
    python -m cassnat_asr_public_tpu.bin.prepare_features \
      --wav_scp $data/$part/wav.scp --out_dir $data/fbank/$part $cmvn_flag
    python $E2EASR/utils/text2token.py --input $data/$part/text \
      --output $data/$part/token_char.scp
  done
  cp $data/fbank/train/cmvn.ark $data/fbank/cmvn.ark
  # char vocab from train transcripts
  mkdir -p $data/dict
  cut -d' ' -f2- $data/train/token_char.scp | tr ' ' '\n' | sort -u \
    | grep -v '^$' > $data/dict/vocab_char.txt
fi

if [ $stage -le 1 ] && [ $end_stage -ge 1 ]; then
  python -m cassnat_asr_public_tpu.bin.train_asr \
    --exp_dir $exp --train_config conf/char_transformer.yaml \
    --data_config conf/data.yaml --optim_type noam --epochs 80 --task art
fi

if [ $stage -le 2 ] && [ $end_stage -ge 2 ]; then
  python $E2EASR/utils/average_checkpoints.py --exp_dir $exp --num 10
fi

if [ $stage -le 3 ] && [ $end_stage -ge 3 ]; then
  for part in dev test; do
    python -m cassnat_asr_public_tpu.bin.decode_asr \
      --task art --test_config ../librispeech/conf/decode.yaml \
      --data_config conf/data.yaml --resume_model $exp/averaged.ckpt \
      --data_path $data/fbank/$part/feats.scp \
      --text_label $data/$part/token_char.scp \
      --decode_type ctc_att --batch_size 8 \
      --result_file $exp/hyp_$part.txt
    python $E2EASR/utils/score_wer.py --cer \
      --ref $data/$part/text --hyp $exp/hyp_$part.txt | tee $exp/cer_$part.txt
  done
fi
