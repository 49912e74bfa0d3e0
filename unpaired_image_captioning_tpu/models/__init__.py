"""Caption model families + NMT seq2seq.

`setup(cfg)` is the factory (parity: reference models/__init__.py:22-57).
"""

from __future__ import annotations

from .base import CaptionDecoder, Features
from .fc import FCModel
from .att import (
    AdaAttModel,
    AdaAttMOModel,
    Att2all2Model,
    Att2in2Model,
    Att2inModel,
    AttModel,
    DenseAttModel,
    ShowAttendTellModel,
    StackAttModel,
    TopDownModel,
)
from .transformer import TransformerModel
from .stackcap import StackCapModel
from .show_tell import AllImgModel, ShowTellModel

_REGISTRY = {
    # reference factory wiring (models/__init__.py:22-57): 'fc' -> FCModel_NMT;
    # here FCModel implements the FCModel_NMT behavior (dropout in the cell).
    "fc": FCModel,
    "att2in": Att2inModel,
    "att2in2": Att2in2Model,
    "att2all2": Att2all2Model,
    "adaatt": AdaAttModel,
    "adaattmo": AdaAttMOModel,
    "topdown": TopDownModel,
    "stackatt": StackAttModel,
    "denseatt": DenseAttModel,
    "transformer": TransformerModel,
    "stackcap": StackCapModel,
    # present-but-unwired in the reference factory; wired here for completeness
    "show_tell": ShowTellModel,
    "show_attend_tell": ShowAttendTellModel,
    "all_img": AllImgModel,
}


def setup(cfg) -> CaptionDecoder:
    """Build a caption model from config (parity: models/__init__.py:22-57)."""
    try:
        cls = _REGISTRY[cfg.caption_model]
    except KeyError:
        raise Exception("Caption model not supported: {}".format(cfg.caption_model))
    return cls.from_config(cfg)
