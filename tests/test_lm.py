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


# ---------------------------------------------------------------------------
# Jelinek-Mercer interpolated bigram scoring


def test_jm_bigram_hand_computed(spark):
    import math

    from hickoryspark.ops.lm import jm_bigram_scores

    train = spark.createDataFrame(
        [(100, "a b a b c")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [(0, "a b x"), (1, "solo"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["micronats_per_bigram"])
           for r in jm_bigram_scores(train, score, lam_milli=700).collect()}
    # train: uni a:2 b:2 c:1 (N=5, V=3); bigrams 'a b':2 'b a':1 'b c':1
    nv1 = 5 + 3 + 1

    def cost(c_hw, c_h, c_w):
        t1 = (700.0 * c_hw) / (1000.0 * c_h) if c_h else 0.0
        t2 = (300.0 * (c_w + 1)) / (1000.0 * nv1)
        # Python round is banker's; the engines round half-up — use
        # floor(x + 0.5) which matches for positive costs
        return math.floor(-1e6 * math.log(t1 + t2) + 0.5)

    want0 = (cost(2, 2, 2) + cost(0, 2, 0)) // 2  # 'a b' + 'b x'
    assert out[0] == (2, want0)
    assert out[1] == (0, None)
    assert out[2] == (0, None)


def test_jm_bigram_mirror_matches(spark):
    import duckdb

    from hickoryspark.ops.lm import duckdb_jm_bigram_sql, jm_bigram_scores

    rows = [(i, " ".join(
        f"w{(i * j) % 11}" for j in range(1, 8))) for i in range(40)]
    rows.append((99, ""))
    train = [(i, t) for i, t in rows if i % 2 == 0]
    df_t = spark.createDataFrame(train, "doc_id long, text string")
    df_s = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in
                 jm_bigram_scores(df_t, df_s).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE tr(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tr VALUES (?, ?)", train)
    con.execute("CREATE TABLE sc(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO sc VALUES (?, ?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        duckdb_jm_bigram_sql("tr", "sc")).fetchall())
    assert got == want
