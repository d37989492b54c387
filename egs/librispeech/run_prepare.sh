#!/usr/bin/env bash
# Data preparation: fbank features + CMVN + subword units.
# (reference: egs/librispeech/run_prepare.sh; Kaldi make_fbank and the
# external SentencePiece trainer are replaced by in-framework tools.)

. ./path.sh

stage=1
end_stage=3
nbpe=5000
bpemode=unigram   # unigram | bpe
data=./data
corpus=           # raw LibriSpeech root (…/LibriSpeech); enables stage 0

. $E2EASR/utils/parse_options.sh 2>/dev/null || true

set -euo pipefail

if [ $stage -le 0 ] && [ -n "$corpus" ]; then
  echo "Stage 0: LibriSpeech corpus -> data dirs (native FLAC decode)"
  # (reference run_prepare.sh stage 1 / local/data_prep.sh; no external
  # flac CLI needed — wav.scp points at .flac, decoded in-framework)
  for part in dev-clean test-clean dev-other test-other train-clean-100; do
    [ -d $corpus/$part ] || continue
    python local/data_prep.py $corpus/$part \
      $data/$(echo $part | sed s/-/_/g)
  done
fi

if [ $stage -le 1 ] && [ $end_stage -ge 1 ]; then
  echo "Stage 1: fbank feature extraction (+ global CMVN on train)"
  for part in train dev test_clean test_other; do
    [ -f $data/$part/wav.scp ] || continue
    cmvn_flag=""
    [ $part = train ] && cmvn_flag="--cmvn"
    python -m cassnat_asr_public_tpu.bin.prepare_features \
      --wav_scp $data/$part/wav.scp --out_dir $data/fbank/$part \
      --num_bins 80 --window hamming $cmvn_flag
  done
  [ -f $data/fbank/train/cmvn.ark ] && cp $data/fbank/train/cmvn.ark $data/fbank/cmvn.ark
fi

if [ $stage -le 2 ] && [ $end_stage -ge 2 ]; then
  echo "Stage 2: subword model training (nbpe=$nbpe, mode=$bpemode)"
  mkdir -p $data/dict
  cut -d' ' -f2- $data/train/text > $data/dict/input.txt
  python $E2EASR/utils/spm_train.py --input $data/dict/input.txt \
    --model_prefix $data/dict/bpe_${bpemode}_${nbpe} \
    --vocab_size $nbpe --model_type $bpemode
  # vocab file for Vocab() (reserved ids blank/sos/eos/unk prepended at load)
  tail -n +4 $data/dict/bpe_${bpemode}_${nbpe}.vocab | cut -f1 \
    > $data/dict/vocab_wp.txt
fi

if [ $stage -le 3 ] && [ $end_stage -ge 3 ]; then
  echo "Stage 3: tokenized transcripts (token_wp.scp)"
  for part in train dev test_clean test_other; do
    [ -f $data/$part/text ] || continue
    python $E2EASR/utils/spm_encode.py \
      --model $data/dict/bpe_${bpemode}_${nbpe}.model \
      --input $data/$part/text --output $data/$part/token_wp.scp
  done
fi

echo "Data preparation done."
