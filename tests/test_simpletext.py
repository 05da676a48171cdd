"""SimpleText codec (lucene/codecs/simpletext): exact line layout per
SimpleTextFieldsWriter.java:38-46 and a lossless round trip."""

import pytest

from lucene_solr_spark.index.simpletext import (
    export_simpletext,
    import_simpletext,
    unpacked_postings,
)


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    from lucene_solr_spark.index.build import build_index

    pages = spark.createDataFrame(
        [("u0", "cat dog cat"), ("u1", "dog bird"), ("u2", "cat")],
        "url string, text string")
    return build_index(spark, pages,
                       str(tmp_path_factory.mktemp("st_idx")))


class TestSimpleText:
    def test_exact_layout(self, spark, index, tmp_path):
        out = str(tmp_path / "dump.pst")
        n = export_simpletext(spark, index, out)
        text = open(out, encoding="utf-8").read()
        # SimpleTextFieldsWriter prefixes, two-space indent steps
        assert text.startswith("field text\n")
        assert text.endswith("END\n")
        assert "  term cat\n" in text
        # doc 0: "cat dog cat" -> freq 2, positions 0 and 2
        assert ("  term cat\n    doc 0\n      freq 2\n"
                "      pos 0\n      pos 2\n") in text
        # terms appear in bytewise order: bird < cat < dog
        assert text.index("term bird") < text.index("term cat") < \
            text.index("term dog")
        assert n == 5  # (bird,1) (cat,0) (cat,2) (dog,0) (dog,1)

    def test_round_trip(self, spark, index, tmp_path):
        out = str(tmp_path / "dump2.pst")
        export_simpletext(spark, index, out)
        back = import_simpletext(spark, out)
        orig = unpacked_postings(spark, index)
        a = sorted((r["term"], r["doc"], r["freq"], tuple(r["positions"]))
                   for r in back.collect())
        b = sorted((r["term"], r["doc"], r["freq"], tuple(r["positions"]))
                   for r in orig.collect())
        assert a == b

    def test_unpacked_matches_corpus(self, spark, index):
        rows = {(r["term"], r["doc"]): (r["freq"], list(r["positions"]))
                for r in unpacked_postings(spark, index).collect()}
        assert rows[("cat", 0)] == (2, [0, 2])
        assert rows[("dog", 1)] == (1, [0])
        assert rows[("bird", 1)] == (1, [1])
        assert rows[("cat", 2)] == (1, [0])
