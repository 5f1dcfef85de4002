"""Model mapping tests (Go describer.go struct-tag analog)."""
import dataclasses

import pytest

from reindexer_tpu import Query, Reindexer, IndexType
from reindexer_tpu.orm import (decode_results, model_indexes,
                               open_namespace_for, rx_field, to_doc)


@dataclasses.dataclass
class Item:
    id: int = rx_field("id,hash,pk", 0)
    year: int = rx_field("year,tree", 0)
    name: str = rx_field("name,hash", "")
    tags: list = rx_field("tags,hash", None)
    txt: str = rx_field("txt,text", "")
    extra: str = ""


def test_model_indexes():
    defs = {d.name: d for d in model_indexes(Item)}
    assert set(defs) == {"id", "year", "name", "tags", "txt"}
    assert defs["id"].opts.is_pk
    assert defs["year"].index_type == IndexType.TREE
    assert defs["tags"].opts.is_array
    assert defs["txt"].index_type == IndexType.TEXT


def test_end_to_end_model_crud():
    db = Reindexer()
    open_namespace_for(db, "m", Item)
    db.upsert("m", to_doc(Item(id=1, year=2020, name="a", tags=[1, 2],
                               txt="hello world")))
    db.upsert("m", to_doc(Item(id=2, year=2021, name="b", tags=[3],
                               txt="other text", extra="x")))
    res = db.select(Query("m").where("year", ">", 2020))
    items = decode_results(Item, res)
    assert len(items) == 1 and items[0].id == 2 and items[0].extra == "x"
    res2 = db.select(Query("m").match("txt", "hello"))
    assert decode_results(Item, res2)[0].id == 1


def test_vector_model():
    @dataclasses.dataclass
    class V:
        id: int = rx_field("id,hash,pk", 0)
        vec: list = rx_field("vec,hnsw", None, dims=8, metric="l2", m=8)

    defs = {d.name: d for d in model_indexes(V)}
    assert defs["vec"].index_type == IndexType.HNSW
    assert defs["vec"].vector_opts.dims == 8
    assert defs["vec"].vector_opts.m == 8
