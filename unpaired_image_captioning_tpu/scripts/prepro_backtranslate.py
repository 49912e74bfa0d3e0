"""Back-translation / pseudo-pair generation.

Parity: reference `scripts/prepro_bt_google.py:19-43` / `prepro_pseudo.py`
— the reference hits the googletrans web API (recreating the client every
100 calls to dodge rate limits, eval_pivot.py:134-136). This environment is
zero-egress, and the framework has its own translator: pseudo pairs are
generated with the in-house NMT model (`--nmt_run`), which is also the
methodologically cleaner unpaired setup. A `--provider google` flag is kept
for API-compatible offline stubbing.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("prepro_backtranslate")
    p.add_argument("--input", required=True, help="one sentence per line")
    p.add_argument("--output", required=True)
    p.add_argument("--provider", choices=["nmt", "google"], default="nmt")
    p.add_argument("--nmt_run", help="run dir for provider=nmt")
    p.add_argument("--beam_size", type=int, default=5)
    a = p.parse_args(argv)

    if a.provider == "google":
        raise SystemExit(
            "provider=google requires network access (googletrans); this "
            "environment is zero-egress — use --provider nmt with a trained "
            "translator checkpoint instead")
    assert a.nmt_run, "--nmt_run required for provider=nmt"
    from ..cli.translate import main as translate_main

    translate_main(["-model", a.nmt_run, "-src", a.input,
                    "-output", a.output, "-beam_size", str(a.beam_size)])
    print(f"back-translated {a.input} -> {a.output}")


if __name__ == "__main__":
    main()
