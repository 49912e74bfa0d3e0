"""CLI surface smoke: every entry point parses --help (import health +
argparse wiring) in-process."""

import importlib

import pytest

ENTRY_POINTS = [
    "cli.train", "cli.eval_paired", "cli.eval_unpaired", "cli.eval_pivot",
    "cli.eval_ensemble", "cli.translate", "cli.preprocess",
    "scripts.prepro_labels", "scripts.prepro_ngrams", "scripts.prepro_feats",
    "scripts.prepro_split_tokenize", "scripts.make_bu_data",
    "scripts.prepro_reference_json", "scripts.prepro_json2text",
    "scripts.prepro_backtranslate", "scripts.migrate_reference",
]


@pytest.mark.parametrize("name", ENTRY_POINTS)
def test_cli_help(name):
    mod = importlib.import_module(f"unpaired_image_captioning_tpu.{name}")
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
