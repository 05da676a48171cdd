"""Replicator module parity (lucene/replicator) — LocalReplicatorTest
behaviors ported, plus an end-to-end replicate-and-search over the
engine index with an NRT update cycle.
"""

import os

import pytest

from lucene_solr_spark.index.replicator import (
    AlreadyClosedException,
    IndexRevision,
    LocalReplicator,
    ReplicationClient,
    SessionExpiredException,
)


@pytest.fixture()
def index(spark, tmp_path):
    from lucene_solr_spark.index.build import build_index

    pages = spark.createDataFrame(
        [(f"u{i}", f"alpha beta doc{i}") for i in range(10)],
        "url string, text string")
    return build_index(spark, pages, str(tmp_path / "src_idx"))


class TestLocalReplicator:
    def test_check_for_update_no_revisions(self):
        # LocalReplicatorTest.testCheckForUpdateNoRevisions
        rep = LocalReplicator()
        assert rep.check_for_update(None) is None

    def test_closed_raises(self, index):
        # testObtainFileAlreadyClosed / testPublishAlreadyClosed /
        # testUpdateAlreadyClosed
        rep = LocalReplicator()
        rep.close()
        with pytest.raises(AlreadyClosedException):
            rep.check_for_update(None)
        with pytest.raises(AlreadyClosedException):
            rep.publish(IndexRevision(index.root))
        with pytest.raises(AlreadyClosedException):
            rep.obtain_file("1", "index", "stats.json")

    def test_publish_same_revision(self, index):
        # testPublishSameRevision: equal version no-ops (and releases the
        # new revision) — the session against the first stays usable
        rep = LocalReplicator()
        r1 = IndexRevision(index.root)
        rep.publish(r1)
        token = rep.check_for_update(None)
        assert token is not None
        r2 = IndexRevision(index.root)
        assert r2.version == r1.version
        rep.publish(r2)
        with rep.obtain_file(token.id, "index", "stats.json") as f:
            assert f.read(1)
        rep.release(token.id)
        rep.close()

    def test_publish_older_rev_raises(self, index, tmp_path):
        rep = LocalReplicator()
        r1 = IndexRevision(index.root)
        # fake a newer generation by linking to a custom snapshot
        r2 = IndexRevision(index.root, str(tmp_path / "snap2"))
        r2.generation = r1.generation + 1
        r2.version = "%x" % r2.generation
        rep.publish(r2)
        with pytest.raises(ValueError, match="older revision"):
            rep.publish(IndexRevision(index.root))
        rep.close()

    def test_update_to_latest(self, index, tmp_path):
        # testUpdateToLatest: client on r1 sees r3's version
        rep = LocalReplicator()
        r1 = IndexRevision(index.root)
        rep.publish(r1)
        r3 = IndexRevision(index.root, str(tmp_path / "snap3"))
        r3.generation = r1.generation + 7
        r3.version = "%x" % r3.generation
        rep.publish(r3)
        token = rep.check_for_update(r1.version)
        assert token is not None and token.version == r3.version
        rep.release(token.id)
        rep.close()

    def test_up_to_date_client_gets_none(self, index):
        rep = LocalReplicator()
        r1 = IndexRevision(index.root)
        rep.publish(r1)
        assert rep.check_for_update(r1.version) is None
        rep.close()

    def test_session_expiration(self, index):
        # testSessionExpiration
        rep = LocalReplicator()
        rep.publish(IndexRevision(index.root))
        token = rep.check_for_update(None)
        rep.expiration_threshold_ms = 0
        with pytest.raises(SessionExpiredException):
            rep.obtain_file(token.id, "index", "stats.json")
        rep.close()

    def test_obtain_missing_file(self, index):
        rep = LocalReplicator()
        rep.publish(IndexRevision(index.root))
        token = rep.check_for_update(None)
        with pytest.raises(FileNotFoundError):
            rep.obtain_file(token.id, "index", "no_such_file")
        rep.release(token.id)
        rep.close()

    def test_revision_release_frees_snapshot(self, index):
        # testRevisionRelease: after publish of a newer revision and no
        # sessions, the older snapshot dir is reclaimed
        rep = LocalReplicator()
        r1 = IndexRevision(index.root)
        snap1 = r1.snapshot
        rep.publish(r1)
        r2 = IndexRevision(index.root, snap1 + "_b")
        r2.generation = r1.generation + 1
        r2.version = "%x" % r2.generation
        rep.publish(r2)
        assert not os.path.exists(snap1)
        rep.close()


class TestReplicationE2E:
    def test_replicate_and_search(self, spark, index, tmp_path):
        from lucene_solr_spark.query.executor import Searcher

        rep = LocalReplicator()
        rep.publish(IndexRevision(index.root))
        replica = str(tmp_path / "replica")
        client = ReplicationClient(rep, replica)
        assert client.update_now() is True
        assert client.update_now() is False  # already current

        src = Searcher(spark, index)
        dst = Searcher(spark, replica)
        a = [(r.doc_id, round(r.score, 6))
             for r in src.search("alpha", k=5).collect()]
        b = [(r.doc_id, round(r.score, 6))
             for r in dst.search("alpha", k=5).collect()]
        assert a == b

    def test_incremental_update_cycle(self, spark, index, tmp_path):
        from lucene_solr_spark.query.executor import Searcher
        from lucene_solr_spark.streaming.nrt import append_segment

        rep = LocalReplicator()
        rep.publish(IndexRevision(index.root))
        replica = str(tmp_path / "replica2")
        client = ReplicationClient(rep, replica)
        assert client.update_now()
        v1 = client.current_version

        more = spark.createDataFrame(
            [("u_new1", "alpha gamma fresh"), ("u_new2", "beta fresh")],
            "url string, text string")
        append_segment(spark, more, index)
        rep.publish(IndexRevision(index.root))
        assert client.update_now()
        assert client.current_version != v1

        dst = Searcher(spark, replica)
        hits = dst.search("fresh", k=5).collect()
        assert len(hits) == 2
        rep.close()


class TestIndexAndTaxonomy:
    def test_composite_revision_and_sync(self, spark, index, tmp_path):
        from lucene_solr_spark.index.replicator import (
            IndexAndTaxonomyRevision,
        )
        from lucene_solr_spark.query.facet_taxonomy import (
            build_facet_index,
            count_facets,
            load_facet_index,
            to_simple_string,
        )

        # build a facet side-index next to the search index
        docs = spark.createDataFrame(
            [(0, ["Author/Bob"]), (1, ["Author/Lisa"]), (2, ["Author/Lisa"])],
            "doc_id long, categories array<string>")
        taxo_dir = str(tmp_path / "facets")
        build_facet_index(docs).save(taxo_dir)

        rev = IndexAndTaxonomyRevision(index.root, taxo_dir)
        assert ":" in rev.version
        # composite comparison: index generation first
        assert rev.compare_to_version(rev.version) == 0
        assert rev.compare_to_version("0:0") > 0

        rep = LocalReplicator()
        rep.publish(rev)
        replica_idx = str(tmp_path / "replica_idx")
        replica_taxo = str(tmp_path / "replica_taxo")
        client = ReplicationClient(
            rep, replica_idx, source_dirs={"index": replica_idx,
                                           "taxo": replica_taxo})
        assert client.update_now() is True

        # both replicas usable: search + facet counts
        from lucene_solr_spark.query.executor import Searcher

        assert Searcher(spark, replica_idx).search("alpha", k=3).count() == 3
        fidx = load_facet_index(spark, replica_taxo)
        res = count_facets(fidx, None, [("Author", 10)])
        assert to_simple_string("Author", res["Author"]) == \
            "Author (0)\n  Lisa (2)\n  Bob (1)\n"
        rep.close()
