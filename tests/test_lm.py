"""Unigram LM scoring tests (ops/lm.py unigram_logprob_scores)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from hickoryspark.spark.session import get_spark

    s = get_spark(4, app_name="hickoryspark-lm-tests",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s




class TestUnigramLogprob:
    TRAIN = [(0, "the cat sat on the mat"), (1, "the dog sat"),
             (2, "")]
    SCORE = [(10, "the cat"), (11, "unseen words here"),
             (12, ""), (13, "the the the")]

    def _py_scores(self):
        import math

        toks = [t for _, x in self.TRAIN for t in x.split()]
        n = len(toks)
        model = {}
        for t in toks:
            model[t] = model.get(t, 0) + 1
        v = len(model)
        out = {}
        for did, x in self.SCORE:
            ts = x.split()
            if not ts:
                out[did] = (0, None)
                continue
            total = 0
            for t in ts:
                c = model.get(t, 0)
                # Python round() is half-even; the engines round
                # half-up — emulate half-up explicitly
                val = 1e6 * math.log((n + v + 1) / (c + 1))
                total += math.floor(val + 0.5)
            out[did] = (len(ts), total // len(ts))
        return out

    def test_matches_python_reference(self, spark):
        from hickoryspark.ops.lm import unigram_logprob_scores

        train = spark.createDataFrame(self.TRAIN,
                                      "doc_id long, text string")
        score = spark.createDataFrame(self.SCORE,
                                      "doc_id long, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["micronats_per_token"])
               for r in unigram_logprob_scores(train, score).collect()}
        assert got == self._py_scores()
        # rare/unseen scores higher than frequent
        assert got[11][1] > got[10][1] > got[13][1]
        assert got[12] == (0, None)

    def test_duckdb_mirror(self, spark):
        import duckdb

        from hickoryspark.ops.lm import (duckdb_unigram_logprob_sql,
                                         unigram_logprob_scores)

        train = spark.createDataFrame(self.TRAIN,
                                      "doc_id long, text string")
        score = spark.createDataFrame(self.SCORE,
                                      "doc_id long, text string")
        got = sorted(tuple(r) for r in
                     unigram_logprob_scores(train, score).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE tr (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO tr VALUES (?, ?)", self.TRAIN)
        con.execute("CREATE TABLE sc (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO sc VALUES (?, ?)", self.SCORE)
        want = sorted(tuple(r) for r in con.execute(
            duckdb_unigram_logprob_sql("tr", "sc")).fetchall())
        assert got == want
