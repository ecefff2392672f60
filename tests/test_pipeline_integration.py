"""End-to-end composition of the engine's two halves: a CDC change log
maintains a documents table (collapse → MERGE, the reference pipeline),
and the training-data operators (curation filters, exact dedup, packing)
run over the merged current state. Asserts the full chain against
independently computed expectations — the "replicate your OLTP corpus
and curate it into a training set" use case.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from rust_cdc_spark.functions import text as TX
from rust_cdc_spark.operators.bpe import learn_bpe_merges
from rust_cdc_spark.operators.dedup import exact_dedup
from rust_cdc_spark.operators.merge import merge_upsert


def _env(op, pos, before=None, after=None):
    return Row(
        log_file="binlog.000001",
        log_pos=pos,
        op=op,
        before=before,
        after=after,
    )


def _img(doc_id, text, source="web"):
    return Row(doc_id=doc_id, text=text, source=source)


IMG_SCHEMA = "struct<doc_id:bigint,text:string,source:string>"


def _changes(spark, rows):
    return spark.createDataFrame(
        rows,
        f"log_file string, log_pos bigint, op string, "
        f"before {IMG_SCHEMA}, after {IMG_SCHEMA}",
    )


GOOD = (
    "the cat is in the hat and it is a good day to read of things "
    "that are in the world and it is fine"
)
DUP = "the dog is in the yard and it is a fine day to run"
JUNK = "zzzz qqqq xxxx"


class TestCdcToTrainingSet:
    def test_merge_then_curate_then_pack(self, spark):
        target = spark.createDataFrame(
            [
                _img(1, GOOD),
                _img(2, DUP),
                _img(4, "stale text to be replaced"),
            ],
            IMG_SCHEMA.replace("struct<", "").replace(">", "")
            .replace(":", " "),
        )
        changes = _changes(
            spark,
            [
                _env("I", 10, after=_img(3, DUP)),        # dup of doc 2
                _env("U", 20, before=_img(4, "stale text to be replaced"),
                     after=_img(4, GOOD + " extra")),
                _env("I", 30, after=_img(5, JUNK)),        # fails curation
                _env("I", 40, after=_img(6, GOOD)),        # dup of doc 1
                _env("D", 50, before=_img(2, DUP), after=None),
            ],
        )
        state = merge_upsert(target, changes, ["doc_id"])
        got_state = {r.doc_id: r.text for r in state.collect()}
        assert got_state == {
            1: GOOD,
            3: DUP,          # insert survives; original doc 2 deleted
            4: GOOD + " extra",
            5: JUNK,
            6: GOOD,
        }

        # curation over the merged state: lang/quality filter then exact
        # dedup keeps the canonical (min doc_id) copy per fingerprint
        curated = (
            state.filter(
                (TX.stopword_ratio("text") >= 0.08)
                & (TX.quality_score("text") >= 0.5)
            )
        )
        canon = exact_dedup(curated).filter(F.col("n_copies") >= 1)
        kept = {r.canonical_id for r in canon.collect()}
        # JUNK (doc 5) fails filters; GOOD dedups 1 vs 6 -> keep 1
        assert kept == {1, 3, 4}

        # pack the surviving docs into token-budget bins (CTX=16 to make
        # multiple bins from a tiny corpus) and check the bins reconcile
        keep_df = state.join(
            canon.select(F.col("canonical_id").alias("doc_id")), "doc_id"
        ).select(
            "doc_id", TX.token_count("text").cast("bigint").alias("n_tokens")
        )
        from pyspark.sql import Window

        w = (
            Window.orderBy(F.md5(F.col("doc_id").cast("string")))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        packed = keep_df.select(
            "doc_id",
            "n_tokens",
            F.floor((F.sum("n_tokens").over(w) - 1) / 16).alias("bin_id"),
        ).collect()
        total = sum(r.n_tokens for r in packed)
        bins = {r.bin_id for r in packed}
        # a doc larger than the budget spans bins (trainer continues it),
        # so bins need not be contiguous; the LAST doc must land in the
        # final bin and every id must be in range
        assert max(bins) == (total - 1) // 16
        assert all(0 <= b <= (total - 1) // 16 for b in bins)
        assert len(packed) == 3

    def test_bpe_trains_on_merged_state(self, spark):
        """The tokenizer trains on the *current* table state — deleted
        and stale rows must not influence the merge statistics."""
        target = spark.createDataFrame(
            [_img(1, "ab ab ab")], IMG_SCHEMA.replace("struct<", "")
            .replace(">", "").replace(":", " ")
        )
        changes = _changes(
            spark,
            [
                _env("I", 10, after=_img(2, "cd cd cd cd")),
                _env("D", 20, before=_img(1, "ab ab ab"), after=None),
            ],
        )
        state = merge_upsert(target, changes, ["doc_id"])
        merges = learn_bpe_merges(state, n_merges=1)
        # only 'cd cd cd cd' remains -> (c,d) x4, never (a,b)
        assert merges == [("c", "d", 4)]


class TestRagIngestionToRetrieval:
    """RAG end-to-end: chunk the corpus, embed each chunk with a
    deterministic stub encoder, build the PQ index over chunk
    embeddings, retrieve for a probe chunk, exact-rerank the pool —
    every stage is an operator the engine ships; this asserts they
    compose and that retrieval surfaces the probe's own chunk first."""

    DIM = 32

    def _stub_embed(self, df, text_col="chunk_text", dim=DIM):
        """Deterministic bag-of-hashed-words embedding: each token adds
        ±1 to the bucket md5(token) % dim picks — pure codegen (the
        real encoder is a mapInPandas batch, operators/multimodal.py
        shows the slot)."""
        toks = F.split(F.trim(F.col(text_col)), " ")
        buckets = [
            F.aggregate(
                F.filter(
                    toks,
                    lambda t: (
                        F.conv(F.substring(F.md5(t), 1, 6), 16, 10)
                        .cast("long") % self.DIM
                    ) == j,
                ),
                F.lit(0.0),
                lambda acc, t: acc
                + F.when(
                    (
                        F.conv(F.substring(F.md5(t), 8, 6), 16, 10)
                        .cast("long") % 2
                    ) == 0,
                    1.0,
                ).otherwise(-1.0),
            ).alias(f"e{j}")
            for j in range(dim)
        ]
        return df.withColumn("embedding", F.array(*buckets).cast("array<float>")).drop(
            *[f"e{j}" for j in range(dim)]
        )

    def test_chunk_embed_index_retrieve(self, spark):
        from rust_cdc_spark.operators import pq as PQ
        from rust_cdc_spark.sources.tables import load_table
        from tests.conftest import SF_SMOKE

        docs = load_table(spark, "documents", SF_SMOKE).limit(120)
        # chunk: 20-token windows, stride 10 (the registered query's op)
        toks = F.split(F.trim("text"), " ")
        n_chunks = F.ceil(
            F.greatest(F.size(toks) - 20, F.lit(0)) / 10.0
        ).cast("long") + 1
        chunks = (
            docs.select(
                "doc_id",
                F.posexplode(
                    F.transform(
                        F.sequence(F.lit(0), n_chunks - 1),
                        lambda i: F.concat_ws(
                            " ", F.slice(toks, i * 10 + 1, 20)
                        ),
                    )
                ).alias("chunk_id", "chunk_text"),
            )
            .withColumn(
                "vec_id",
                F.col("doc_id") * 1000 + F.col("chunk_id"),
            )
        )
        embedded = self._stub_embed(chunks).cache()
        n = embedded.count()
        assert n > 200

        cb = PQ.train_pq(
            embedded, m=8, k=16, dim=self.DIM, iters=2, vec_col="embedding"
        )
        codes = PQ.encode_pq(embedded, cb, vec_col="embedding").cache()

        probe_row = embedded.orderBy("vec_id").first()
        probe = [float(x) for x in probe_row.embedding]
        pool_ids = [
            r.vec_id
            for r in PQ.pq_topk(codes, cb, probe, k=max(32, n // 5)).collect()
        ]
        # exact rerank of the pool
        import numpy as np

        V = {
            r.vec_id: np.asarray(r.embedding, float)
            for r in embedded.filter(F.col("vec_id").isin(pool_ids)).collect()
        }
        p = np.asarray(probe)
        reranked = sorted(V, key=lambda i: float(((V[i] - p) ** 2).sum()))
        # self-retrieval: the probe's own chunk is the nearest neighbor
        assert reranked[0] == probe_row.vec_id


class TestDeltaLogExport:
    """export_delta_log: structural conformance with the public Delta
    transaction protocol (no delta jars in the image, so the format
    itself is asserted and the action stream replayed)."""

    def _table(self, spark, tmp_path, partitioned=False):
        import json as _json
        from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

        t = ParquetUpsertTable(
            str(tmp_path / "t"),
            ["id"],
            partition_by=["part"] if partitioned else None,
        )
        df1 = spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y")], ["id", "val", "part"]
        )
        df2 = spark.createDataFrame(
            [(1, "a2", "x"), (3, "c", "y")], ["id", "val", "part"]
        )
        t.overwrite(df1)
        t.overwrite(df2)
        return t

    def _actions(self, log_dir):
        import json as _json
        import os as _os

        commits = sorted(
            f for f in _os.listdir(log_dir) if f.endswith(".json")
        )
        return commits, [
            [_json.loads(line) for line in open(_os.path.join(log_dir, f))]
            for f in commits
        ]

    def test_log_structure_and_replay(self, spark, tmp_path):
        import os as _os
        from pyspark.sql import types as T

        t = self._table(spark, tmp_path)
        log_dir = t.export_delta_log(spark)
        commits, actions = self._actions(log_dir)
        assert commits[0] == "0" * 20 + ".json"
        assert len(commits) == len(t.history())
        first = actions[0]
        assert first[0]["protocol"] == {
            "minReaderVersion": 1,
            "minWriterVersion": 2,
        }
        md = first[1]["metaData"]
        assert md["format"] == {"provider": "parquet", "options": {}}
        # schemaString is Spark's own StructType json — round-trips
        schema = T.StructType.fromJson(__import__("json").loads(md["schemaString"]))
        assert schema == t.read(spark).schema
        # replay the action stream: surviving file set == live snapshot
        live = set()
        for commit in actions:
            for a in commit:
                if "remove" in a:
                    live.discard(a["remove"]["path"])
                elif "add" in a:
                    add = a["add"]
                    assert add["dataChange"] is True
                    assert add["size"] > 0
                    live.add(add["path"])
        snap = t._snapshot_dir(t.version())
        expect = set()
        for root, _d, names in _os.walk(snap):
            for n in names:
                if n.endswith(".parquet"):
                    expect.add(
                        _os.path.relpath(_os.path.join(root, n), t.path)
                    )
        assert live == expect
        # reading exactly the surviving files reproduces the table
        paths = [_os.path.join(t.path, p) for p in sorted(live)]
        got = spark.read.parquet(*paths)
        assert sorted(r.id for r in got.collect()) == sorted(
            r.id for r in t.read(spark).collect()
        )

    def test_partition_values_parsed_from_layout(self, spark, tmp_path):
        t = self._table(spark, tmp_path, partitioned=True)
        log_dir = t.export_delta_log(spark)
        _commits, actions = self._actions(log_dir)
        md = actions[0][1]["metaData"]
        assert md["partitionColumns"] == ["part"]
        adds = [a["add"] for c in actions for a in c if "add" in a]
        assert adds and all(a["partitionValues"].get("part") in ("x", "y")
                            for a in adds)

    # Pinned-bytes golden of the serialized protocol (no Delta reader
    # ships in this image — ADVICE/VERDICT r3 ask #7 — so the exact
    # JSON layout a reader would parse is frozen here). Volatile fields
    # (table uuid, task-uuid file names, sizes, wall-clock timestamps)
    # are normalized to placeholders; EVERYTHING else — action order,
    # key order, schemaString encoding, flag values — must match
    # byte-for-byte.
    GOLDEN = (
        "## 00000000000000000000.json\n"
        '{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}\n'
        '{"metaData": {"id": "<TABLE_ID>", "format": {"provider": '
        '"parquet", "options": {}}, "schemaString": '
        '"{\\"fields\\":[{\\"metadata\\":{},\\"name\\":\\"id\\",'
        '\\"nullable\\":true,\\"type\\":\\"long\\"},'
        '{\\"metadata\\":{},\\"name\\":\\"val\\",\\"nullable\\":true,'
        '\\"type\\":\\"string\\"},{\\"metadata\\":{},\\"name\\":'
        '\\"part\\",\\"nullable\\":true,\\"type\\":\\"string\\"}],'
        '\\"type\\":\\"struct\\"}", "partitionColumns": [], '
        '"configuration": {}}}\n'
        '{"add": {"path": "v=0/<FILE0>", "partitionValues": {}, '
        '"size": <SIZE>, "modificationTime": <TS>, "dataChange": true}}\n'
        "## 00000000000000000001.json\n"
        '{"remove": {"path": "v=0/<FILE0>", "deletionTimestamp": <TS>, '
        '"dataChange": true}}\n'
        '{"add": {"path": "v=1/<FILE1>", "partitionValues": {}, '
        '"size": <SIZE>, "modificationTime": <TS>, "dataChange": true}}\n'
    )

    def test_pinned_golden_action_bytes(self, spark, tmp_path):
        import json as _json
        import os as _os
        import re as _re
        from rust_cdc_spark.streaming.pipeline import ParquetUpsertTable

        t = ParquetUpsertTable(str(tmp_path / "t"), ["id"])
        df1 = spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y")], ["id", "val", "part"]
        ).coalesce(1)
        df2 = spark.createDataFrame(
            [(1, "a2", "x"), (3, "c", "y")], ["id", "val", "part"]
        ).coalesce(1)
        t.overwrite(df1)
        t.overwrite(df2)
        log_dir = t.export_delta_log(spark)

        out, file_ids = [], {}
        for f in sorted(_os.listdir(log_dir)):
            out.append(f"## {f}\n")
            for line in open(_os.path.join(log_dir, f)):
                for m in _re.findall(r"v=(\d+)/(part-[^\"]+\.parquet)", line):
                    file_ids.setdefault(m[1], f"<FILE{m[0]}>")
                for name, ph in file_ids.items():
                    line = line.replace(name, ph)
                line = _re.sub(r'("size": )\d+', r"\1<SIZE>", line)
                line = _re.sub(
                    r'("(?:modificationTime|deletionTimestamp)": )\d+',
                    r"\1<TS>", line,
                )
                line = _re.sub(
                    r'("id": ")[0-9a-f-]{36}(")', r"\1<TABLE_ID>\2", line
                )
                out.append(line)
        normalized = "".join(out)
        assert normalized == self.GOLDEN
        # and the placeholder-free parts still parse as JSON objects
        for raw in self.GOLDEN.splitlines():
            if raw.startswith("##"):
                continue
            parseable = (
                raw.replace("<TABLE_ID>", "x").replace("<FILE0>", "f0")
                .replace("<FILE1>", "f1").replace("<SIZE>", "1")
                .replace("<TS>", "1")
            )
            assert isinstance(_json.loads(parseable), dict)
