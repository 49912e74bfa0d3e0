#!/usr/bin/env bash
# Orchestration recipes (parity: reference train.sh:1-293 mode dispatch —
# denseatt/stackcap/transformer/fc x {XE phase then SCST RL phase}, NMT-only
# training, zh2en transformer recipes). Usage: ./train.sh <func> [id]
set -euo pipefail

DATA=${DATA:-data}
ID=${2:-$(date +%Y%m%d-%H%M%S)}

common_args=(
  --input_json "$DATA/chinese_talk.json"
  --input_label_h5 "$DATA/chinese_talk_label.h5"
  --input_fc_dir "$DATA/aic_fc" --input_att_dir "$DATA/aic_att"
  --cached_tokens "$DATA/aic-train-idxs.npz"
  --i2t_train_flag true
)

func_i2t_xe_rl() {  # XE phase then SCST RL (reference train.sh:25-46)
  local model=$1
  python -m unpaired_image_captioning_tpu.cli.train "${common_args[@]}" \
    --caption_model "$model" --id "${ID}.${model}" \
    --batch_size 16 --max_epochs 37 --i2t_learning_rate 5e-4 \
    --scheduled_sampling_start 0 --language_eval 1
  python -m unpaired_image_captioning_tpu.cli.train "${common_args[@]}" \
    --caption_model "$model" --id "${ID}.${model}" \
    --start_from "save/${ID}.${model}" \
    --batch_size 16 --max_epochs 60 --self_critical_after 37 \
    --i2t_learning_rate 5e-5 --language_eval 1
}

func_nmt_xe() {  # NMT-only training (reference train.sh:114-129)
  python -m unpaired_image_captioning_tpu.cli.train \
    --id "${ID}.nmt" --i2t_train_flag false --nmt_train_flag true \
    --input_json "$DATA/chinese_talk.json" \
    --input_label_h5 "$DATA/chinese_talk_label.h5" \
    --input_nmt_h5 "$DATA/nmt.train.h5" \
    --nmt_optim sgd --nmt_learning_rate 1.0 --nmt_max_grad_norm 5 \
    --max_epochs 30
}

func_nmt_zh2en() {  # standalone zh->en recipe (reference train.sh:147-265)
  python -m unpaired_image_captioning_tpu.cli.preprocess \
    -train_src "$DATA/train.zh" -train_tgt "$DATA/train.en" \
    -valid_src "$DATA/valid.zh" -valid_tgt "$DATA/valid.en" \
    -save_data "$DATA/aic_zh2en" -src_seq_length 50 -tgt_seq_length 50
  python -m unpaired_image_captioning_tpu.cli.train \
    --id "${ID}.zh2en" --i2t_train_flag false --nmt_train_flag true \
    --input_json "$DATA/chinese_talk.json" \
    --input_label_h5 "$DATA/chinese_talk_label.h5" \
    --input_nmt_h5 "$DATA/aic_zh2en.train.h5" \
    --nmt_decay_method noam --nmt_warmup_steps 4000 --max_epochs 30
}

case "${1:-}" in
  denseatt|stackcap|transformer|fc|topdown) func_i2t_xe_rl "$1" ;;
  nmt) func_nmt_xe ;;
  zh2en) func_nmt_zh2en ;;
  *) echo "usage: $0 {denseatt|stackcap|transformer|fc|topdown|nmt|zh2en} [id]"; exit 1 ;;
esac
