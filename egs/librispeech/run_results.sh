#!/usr/bin/env bash
# Grep WER results across experiments (reference: run_results.sh).
for f in exp/*/wer_*.txt; do
  [ -f "$f" ] && echo "$f: $(cat $f)"
done
