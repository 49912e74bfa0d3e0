"""CLI entry points mirroring the reference scripts: train, eval_paired,
eval_unpaired, eval_pivot, eval_ensemble, translate, preprocess."""
