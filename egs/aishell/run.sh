#!/usr/bin/env bash
# Aishell-1 Mandarin char-level AST/NAST recipe (CER scoring).
# Exercises the alternate vocab path (BASELINE.md Aishell numbers).
#
# Data-free validation: SYNTH=1 generates a synthetic char corpus
# (local/prepare_synth_char.py — same learnable synthetic speech as
# egs/synth, word boundaries dropped by the char tokenizer exactly as
# for Mandarin) and the small conf/char_synth.yaml drives the identical
# stages to a CER number (RESULTS_synth.md; tests/test_aishell_recipe.py
# smokes the same path):
#   SYNTH=1 TRAIN_CONF=conf/char_synth.yaml EPOCHS=30 AVG_NUM=5 \
#     DECODE_CONF=conf/char_synth_decode.yaml bash run.sh --stage 0

. ../librispeech/path.sh

stage=1
end_stage=6
exp=${EXP:-exp/aishell_art}
data=./data
train_conf=${TRAIN_CONF:-conf/char_transformer.yaml}
decode_conf=${DECODE_CONF:-../librispeech/conf/decode.yaml}
epochs=${EPOCHS:-80}
avg_num=${AVG_NUM:-10}
synth=${SYNTH:-0}
synth_n=${SYNTH_N:-600}
synth_eval=${SYNTH_EVAL:-100}
. $E2EASR/utils/parse_options.sh 2>/dev/null || true
set -euo pipefail

if [ $stage -le 0 ] && [ $end_stage -ge 0 ]; then
  if [ "$synth" = 1 ] && [ ! -f $data/train/wav.scp ]; then
    echo "Stage 0a: synthetic char corpus ($synth_n train utts)"
    python local/prepare_synth_char.py --out $data --n_train $synth_n --n_eval $synth_eval
  fi
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
    --exp_dir $exp --train_config $train_conf \
    --data_config conf/data.yaml --optim_type noam --epochs $epochs \
    --task art
fi

if [ $stage -le 2 ] && [ $end_stage -ge 2 ]; then
  python $E2EASR/utils/average_checkpoints.py --exp_dir $exp --num $avg_num
fi

if [ $stage -le 3 ] && [ $end_stage -ge 3 ]; then
  for part in dev test; do
    python -m cassnat_asr_public_tpu.bin.decode_asr \
      --task art --test_config $decode_conf \
      --data_config conf/data.yaml --resume_model $exp/averaged.ckpt \
      --data_path $data/fbank/$part/feats.scp \
      --text_label $data/$part/token_char.scp \
      --decode_type ctc_att --batch_size 8 \
      --result_file $exp/hyp_$part.txt
    python $E2EASR/utils/score_wer.py --cer \
      --ref $data/$part/text --hyp $exp/hyp_$part.txt | tee $exp/cer_$part.txt
  done
fi

nat_exp=${NAT_EXP:-exp/aishell_cassnat}
if [ "$synth" = 1 ]; then
  nat_conf=${NAT_CONF:-conf/cassnat_synth.yaml}
else
  nat_conf=${NAT_CONF:-conf/char_cassnat.yaml}
fi
nat_dec_best=${NAT_DECODE_CONF:-conf/cassnat_synth_decode.yaml}
nat_dec_esa=${NAT_DECODE_ESA_CONF:-conf/cassnat_synth_decode_esa.yaml}

if [ $stage -le 4 ] && [ $end_stage -ge 4 ]; then
  # CASS-NAT trained with the AST-encoder init (model surgery; reference
  # run_cassnat.sh stage 1 init_encoder + cassnat_task.py:62-83)
  python -m cassnat_asr_public_tpu.bin.train_asr \
    --exp_dir $nat_exp --train_config $nat_conf \
    --data_config conf/data.yaml --optim_type noam --epochs $epochs \
    --resume_model $exp/best_model.ckpt \
    --task cassnat
fi

if [ $stage -le 5 ] && [ $end_stage -ge 5 ]; then
  for part in dev test; do
    for mode in bestpath esa_self50; do
      dconf=$nat_dec_best
      [ $mode = esa_self50 ] && dconf=$nat_dec_esa
      python -m cassnat_asr_public_tpu.bin.decode_asr \
        --task cassnat --test_config $dconf \
        --data_config conf/data.yaml \
        --resume_model $nat_exp/best_model.ckpt \
        --data_path $data/fbank/$part/feats.scp \
        --text_label $data/$part/token_char.scp \
        --decode_type esa_att --batch_size 8 \
        --result_file $nat_exp/hyp_${mode}_$part.txt
      python $E2EASR/utils/score_wer.py --cer \
        --ref $data/$part/text --hyp $nat_exp/hyp_${mode}_$part.txt \
        | tee $nat_exp/cer_${mode}_$part.txt
    done
  done
fi

if [ $stage -le 6 ] && [ $end_stage -ge 6 ] && [ "$synth" = 1 ]; then
  # CER results table (SURVEY §6 Aishell CER format, synthetic corpus)
  {
    echo "# Aishell char recipe on the synthetic char corpus (SYNTH=1)"
    echo
    echo "Char units (no space token), CER scoring; produced by"
    echo "\`SYNTH=1 bash run.sh --stage 0\` ($synth_n train / $synth_eval eval utts,"
    echo "$epochs epochs)."
    echo
    echo "AST conformer ($train_conf), ctc_att joint decode,"
    echo "checkpoint averaging over the last $avg_num:"
    echo
    echo "| split | CER % |"
    echo "|---|---|"
    for part in dev test; do
      cer=$(grep -o '[WC]ER [0-9.]*' $exp/cer_$part.txt | head -1 | cut -d' ' -f2)
      echo "| $part | $cer |"
    done
    echo
    echo "CASS-NAT ($nat_conf, AST-encoder init), NAT best-path and"
    echo "ESA self-ranked (sample_num 50, thr 0.9) decodes:"
    echo
    echo "| split | decode | CER % |"
    echo "|---|---|---|"
    for part in dev test; do
      for mode in bestpath esa_self50; do
        cer=$(grep -o '[WC]ER [0-9.]*' $nat_exp/cer_${mode}_$part.txt | head -1 | cut -d' ' -f2)
        echo "| $part | $mode | $cer |"
      done
    done
  } > RESULTS_synth.md
  echo "wrote egs/aishell/RESULTS_synth.md"
fi
