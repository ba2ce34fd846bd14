"""Attention codec, radical codec, mesh helpers."""

import numpy as np


def test_attention_codec_roundtrip():
    from fudanocr_tpu.eval.attention_codec import AttentionLabelConverter

    conv = AttentionLabelConverter()
    ids, lengths = conv.encode(["abc", "Z9"], max_len=6)
    assert ids.shape == (2, 6)
    # ignore-case: 'Z' -> 'z'; out-of-alphabet chars dropped
    assert conv.decode_ids(ids) == ["abc", "z9"]
    ids2, _ = conv.encode(["a!b"], max_len=6)
    assert conv.decode_ids(ids2) == ["ab"]


def test_radical_codec_multichar_tokens():
    from fudanocr_tpu.data.codecs import SequenceCodec

    codec = SequenceCodec(["PAD", "r1", "r22", "$"],
                          {"A": ["r1", "r22"]}, terminator="$")
    ti, gt, ln = codec.encode(["A"], max_len=5)
    assert list(gt[0][:3]) == [1, 2, 3] and ln[0] == 3


def test_host_shard_indices_single_process():
    from fudanocr_tpu.core.mesh import host_shard_indices, setup_distributed

    assert setup_distributed() == 0
    idx = list(host_shard_indices(100, 10))
    assert idx == list(range(0, 100, 10))
