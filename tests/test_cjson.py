"""CJSON binary codec roundtrips (reference: cpp_src/core/cjson/
cjsonbuilder.cc / cjsondecoder.cc semantics, stateless tag-table layout)."""
import json
import numpy as np

from reindexer_tpu.core import cjson


def test_roundtrip_scalar_types():
    doc = {"i": 42, "neg": -7, "big": 2**40, "f": 3.5, "s": "héllo",
           "b": True, "b2": False, "n": None, "empty": ""}
    assert cjson.decode_doc(cjson.encode_doc(doc)) == doc


def test_roundtrip_nested():
    doc = {"a": [1, 2.5, "x", None, {"k": [True, []]}],
           "o": {"inner": {"deep": [{"p": 1}, {"p": 2}]}}}
    assert cjson.decode_doc(cjson.encode_doc(doc)) == doc


def test_shared_tag_table_amortizes_names(rng):
    docs = [{"identifier": i, "long_field_name_one": float(i),
             "long_field_name_two": f"v{i}"} for i in range(100)]
    blob = cjson.encode_docs(docs)
    assert cjson.decode_docs(blob) == docs
    as_json = sum(len(json.dumps(d)) for d in docs)
    # field names appear once -> binary page much smaller than JSON
    assert len(blob) < as_json * 0.5
    assert blob.count(b"long_field_name_one") == 1


def test_non_json_values_fall_back_to_str():
    doc = {"arr": np.int64(5)}
    out = cjson.decode_doc(cjson.encode_doc(doc))
    assert out["arr"] == "5"


def test_property_roundtrip_random(rng):
    def rand_value(depth):
        t = rng.integers(0, 8 if depth < 3 else 6)
        if t == 0:
            return None
        if t == 1:
            return bool(rng.integers(0, 2))
        if t == 2:
            return int(rng.integers(-2**40, 2**40))
        if t == 3:
            return float(rng.normal())
        if t in (4, 5):
            return "".join(chr(rng.integers(32, 1000))
                           for _ in range(rng.integers(0, 12)))
        if t == 6:
            return [rand_value(depth + 1)
                    for _ in range(rng.integers(0, 5))]
        return {f"k{j}": rand_value(depth + 1)
                for j in range(rng.integers(0, 5))}

    for _ in range(50):
        doc = {f"f{j}": rand_value(0) for j in range(rng.integers(1, 8))}
        assert cjson.decode_doc(cjson.encode_doc(doc)) == doc


def test_stateful_tag_table_delta_pages():
    """Per-connection delta tag tables (reference: tagsmatcher.h
    stateToken_): the second page with the same field names carries ZERO
    name bytes, later pages only genuinely new names; desync raises."""
    from reindexer_tpu.core.cjson import (TagState, decode_docs_stateful,
                                          encode_docs, encode_docs_stateful)

    docs1 = [{"alpha": 1, "beta": [1, 2], "gamma": {"delta": "x"}}]
    docs2 = [{"alpha": 7, "beta": [], "gamma": {"delta": "y"}}]
    docs3 = [{"alpha": 0, "epsilon": 3.5}]

    enc, dec = TagState(), TagState()
    p1 = encode_docs_stateful(docs1, enc)
    p2 = encode_docs_stateful(docs2, enc)
    p3 = encode_docs_stateful(docs3, enc)
    assert decode_docs_stateful(p1, dec) == docs1
    assert decode_docs_stateful(p2, dec) == docs2
    assert decode_docs_stateful(p3, dec) == docs3
    # page 2 must be smaller than a stateless page (no table resend)
    assert len(p2) < len(encode_docs(docs2))
    # only 'epsilon' is new on page 3
    assert b"epsilon" in p3 and b"alpha" not in p3
    # desync detection
    import pytest
    with pytest.raises(ValueError):
        decode_docs_stateful(p2, TagState())
