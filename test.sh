#!/usr/bin/env bash
# Evaluation recipes (parity: reference test.sh — paired eval at beam 5,
# pivot eval, NMT valid). Usage: ./test.sh <func> <run_dir>
set -euo pipefail

RUN=${2:?run dir required}
DATA=${DATA:-data}

case "${1:-}" in
  paired)   # reference test.sh:24-49: beam 5, batch 50, val budget
    python -m unpaired_image_captioning_tpu.cli.eval_paired \
      --start_from "$RUN" --beam_size 5 --batch_size 50 \
      --val_images_use 5000 --language_eval 1 ;;
  pivot)    # reference test.sh func_i2t_pivot_eval
    python -m unpaired_image_captioning_tpu.cli.eval_pivot \
      --start_from "$RUN" --beam_size 5 --batch_size 50 \
      --val_images_use 5000 --language_eval 1 ;;
  unpaired)
    python -m unpaired_image_captioning_tpu.cli.eval_unpaired \
      --start_from "$RUN" --beam_size 5 --batch_size 50 \
      --val_images_use 5000 --language_eval 1 ;;
  ensemble)
    shift; python -m unpaired_image_captioning_tpu.cli.eval_ensemble \
      --ids "$@" --beam_size 5 --language_eval 1 ;;
  *) echo "usage: $0 {paired|pivot|unpaired|ensemble} <run_dir...>"; exit 1 ;;
esac
