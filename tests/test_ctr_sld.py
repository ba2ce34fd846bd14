"""SLD app: codec/rectifier behaviour + tiny end-to-end train smoke."""

import numpy as np
import pytest

from fudanocr_tpu.data.codecs import SequenceCodec
from fudanocr_tpu.eval.levenshtein import SequenceRectifier, edit_distance


def test_stroke_codec_shift_right():
    codec = SequenceCodec("<12345$", {"A": "123", "B": "45"},
                          terminator="$")
    text_input, text_gt, lengths = codec.encode(["A", "B"], max_len=6)
    # 'A' -> strokes 123$ -> ids [1,2,3,6]
    assert list(text_gt[0][:4]) == [1, 2, 3, 6] and lengths[0] == 4
    # decoder input: start '<' (0) then shifted
    assert list(text_input[0][:4]) == [0, 1, 2, 3]
    assert list(text_gt[1][:3]) == [4, 5, 6] and lengths[1] == 3


def test_rectifier_snaps_to_legal():
    rect = SequenceRectifier(["123", "4455", "12345"])
    assert rect("123") == "123"
    assert rect("124") == "123"
    assert rect("44555") == "4455"
    assert edit_distance("kitten", "sitting") == 3


def test_sld_train_smoke():
    from fudanocr_tpu.apps.sld.train import main

    import tempfile
    with tempfile.TemporaryDirectory() as tmp:
        main(["--options", "epoch=1", "batch=8", "synthetic_samples=16",
              "val_frequency=1000000", f"ckpt_dir={tmp}", "max_len=8",
              "encoder_layers=[1,1,1,1]", "d_embed=32", "d_model=64",
              "d_ff=128", "encoder_width_div=8"])
