"""Misc utilities (parity surface: reference misc/utils.py)."""

from .text import (cocojson2text, decode_sequence, expand_contractions,
                   json2text, self_bleu, text2cocojson, text2textid)
from .report import html_report
