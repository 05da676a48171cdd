"""javabin codec byte parity vs the reference JavaBinCodec compiled
from the tree (tools/javabin_oracle.py)."""

import os
import random
import shutil
import subprocess
from datetime import datetime, timezone

import pytest

from lucene_solr_spark.query.javabin import (
    END_OBJ,
    JavaMap,
    JLong,
    dumps,
    loads,
)
from lucene_solr_spark.query.response_writers import (
    F32,
    DocList,
    NamedList,
    write_response,
)

ORACLE_DIR = "/tmp/jbin"


def _oracle_available():
    return (shutil.which("java") is not None
            and os.path.exists(f"{ORACLE_DIR}/JBOracle.class"))


def _oracle(mode: str, stdin: str = "") -> list[str]:
    out = subprocess.run(
        ["java", "-cp", ORACLE_DIR, "JBOracle", mode],
        input=stdin.encode(), capture_output=True, check=True)
    return out.stdout.decode().split()


def _som(pairs):
    nl = NamedList(pairs)
    nl.ordered = True
    return nl


# mirrors JBOracle's golden case list exactly, in order
GOLDEN_CASES = [
    None, True, False, 0, 1, 14, 15, 127, 123456789, -42,
    JLong(0), JLong(15), JLong(1234567890123), JLong(-7),
    F32(1.5), 2.718281828,
    "hello", "żółć 漢字", "",
    datetime(2000, 2, 1, 3, 4, 5, tzinfo=timezone.utc),
    b"\x01\x02\xfe",
    ["a", 1, True],
    JavaMap([("k1", "v1"), ("k2", 2)]),
    NamedList([("dup", 1), ("dup", 2), ("other", "x")]),
    _som([("status", 0), ("QTime", 5)]),
    _som([
        ("responseHeader", _som([("status", 0), ("QTime", 5)])),
        ("response", DocList(57, 0, [
            {"id": "1", "score": F32(1.25)},
            {"id": "2", "score": F32(0.5)},
        ], max_score=1.25)),
    ]),
]


class TestByteParity:
    @pytest.mark.skipif(not _oracle_available(),
                        reason="compiled reference oracle not present")
    def test_goldens_byte_identical(self):
        expected = _oracle("golden")
        got = [dumps(c).hex() for c in GOLDEN_CASES]
        assert got == expected

    def test_goldens_pinned(self):
        # a few pinned vectors so the test bites even without the oracle
        assert dumps(None).hex() == "0200"
        assert dumps(14).hex() == "024e"
        assert dumps(15).hex() == "025f00"
        assert dumps(127).hex() == "025f07"
        assert dumps(-42).hex() == "0206ffffffd6"
        assert dumps(JLong(0)).hex() == "0260"
        assert dumps(F32(1.5)).hex() == "02083fc00000"
        assert dumps("hello").hex() == "022568656c6c6f"
        assert dumps(["a", 1, True]).hex() == "028321614101"
        assert dumps(NamedList([("dup", 1), ("dup", 2), ("other", "x")])
                     ).hex() == "02c3e02364757041e142e0256f746865722178"

    @pytest.mark.skipif(not _oracle_available(),
                        reason="compiled reference oracle not present")
    def test_fuzz_reference_roundtrip(self):
        # Python-marshaled random trees must survive the REFERENCE codec's
        # unmarshal→marshal unchanged (proves both directions agree)
        rng = random.Random(11)

        def rand_val(depth=0):
            kinds = ["int", "long", "str", "bool", "null", "float"]
            if depth < 3:
                kinds += ["list", "nl", "som"]
            k = rng.choice(kinds)
            if k == "int":
                return rng.randint(-(1 << 31), (1 << 31) - 1)
            if k == "long":
                return JLong(rng.randint(0, (1 << 55)))
            if k == "str":
                return "".join(rng.choice("abżó字 x") for _ in
                               range(rng.randint(0, 12)))
            if k == "bool":
                return rng.random() < 0.5
            if k == "null":
                return None
            if k == "float":
                return F32(rng.randint(-1000, 1000) / 8.0)
            if k == "list":
                return [rand_val(depth + 1)
                        for _ in range(rng.randint(0, 4))]
            pairs = [(f"k{rng.randint(0, 3)}", rand_val(depth + 1))
                     for _ in range(rng.randint(0, 4))]
            nl = NamedList(pairs)
            if k == "som":
                nl.ordered = True
            return nl

        cases = [rand_val() for _ in range(300)]
        mine = [dumps(c).hex() for c in cases]
        echoed = _oracle("roundtrip", "\n".join(mine) + "\n")
        assert echoed == mine

    def test_python_round_trip(self):
        for c in GOLDEN_CASES:
            blob = dumps(c)
            back = loads(blob)
            assert dumps(back) == blob  # canonical re-encode

    def test_loads_rejects_bad_version(self):
        with pytest.raises(ValueError, match="Invalid version"):
            loads(b"\x07\x00")


class TestResponseWriter:
    def test_wt_javabin(self):
        rsp = {"response": {"numFound": 3, "start": 0, "docs": [
            {"id": "1", "score": F32(2.0)}]}}
        blob = write_response(rsp, wt="javabin",
                              params={"omitHeader": "true"})
        assert isinstance(blob, bytes) and blob[0] == 2
        back = loads(blob)
        (key, dl), = back.pairs
        assert key == "response"
        assert dl.num_found == 3
        assert dl.docs[0]["id"] == "1"

    @pytest.mark.skipif(not _oracle_available(),
                        reason="compiled reference oracle not present")
    def test_full_response_reference_roundtrip(self):
        rsp = {"response": {"numFound": 42, "start": 5, "docs": [
            {"id": "a", "title": "żółć", "n": 7, "f": F32(0.25),
             "tags": ["x", "y"], "missing": None},
            {"id": "b", "title": "two", "n": -1, "f": F32(1.0),
             "tags": [], "missing": None},
        ]}, "facet_counts": {"cat": {"a": 2, "b": 1}}}
        blob = write_response(rsp, wt="javabin", params={"q": "t"})
        echoed = _oracle("roundtrip", blob.hex() + "\n")
        assert echoed == [blob.hex()]
