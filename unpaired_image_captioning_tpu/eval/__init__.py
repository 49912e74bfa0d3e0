"""Evaluation harness: metric stacks (BLEU/METEOR/ROUGE/CIDEr), eval_split
loops, and the pivot evaluation pipeline."""
