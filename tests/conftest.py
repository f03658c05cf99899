import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from bytewax_iceberg_connector_spark.session import get_spark

    import tempfile

    scratch = tempfile.mkdtemp(prefix="bic_test_")
    spark = get_spark(
        app_name="tests",
        master="local[4]",
        **{
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
            # managed-table surface (bucketing tests): keep the warehouse
            # and the Derby metastore out of the repo tree
            "spark.sql.warehouse.dir": f"{scratch}/warehouse",
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={scratch}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


# ---------------------------------------------------------------------------
# Adversarial corpora — shared by test_adversarial_corpus.py (every
# registered query) and test_staged_queries.py (the staged gate: a query
# must survive these BEFORE registration — the r12 similarity_mmr lesson,
# where sf0.001 pins passed but the re-ingest duplicate broke the greedy).
# One definition so the two gates can never drift.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="session")
def adv_dir(tmp_path_factory):
    """Adversarial documents: NULL/empty/whitespace/unicode text, NULL
    ids, byte-identical re-ingest duplicates (ids 4 and 7 twice)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_docs")
    pq.write_table(
        pa.table(
            {
                # ids 4 and 7 appear TWICE with byte-identical rows — the
                # re-ingest duplicate shape (r08 family #10): per-document
                # stats (df, dedup families, pair graphs) must treat the
                # copy as the same document, not a near-dup twin
                "doc_id": pa.array(
                    [0, 1, 2, 3, 4, 5, 6, 7, None, 8, 4, 7], pa.int64()
                ),
                "text": pa.array(
                    [
                        None,
                        "",
                        "   ",
                        "solo",
                        "alpha beta gamma delta epsilon",
                        "alpha beta gamma delta epsilon",
                        "Ünïcødé puñctuation!!! ... 🙂 🙂",
                        "a a a a a a a a a a a a",
                        "ghost row with null id",
                        # UNICODE whitespace (NBSP, ideographic space):
                        # Java/RE2/DuckDB \s is ASCII-only, so these are
                        # TOKEN-INTERNAL bytes — every tokenizer (JVM and
                        # Python kernel alike) must agree (r06 find: bare
                        # str.split() split on them)
                        "nb\u00a0sp and\u3000wide alpha beta gamma",
                        "alpha beta gamma delta epsilon",
                        "a a a a a a a a a a a a",
                    ],
                    pa.string(),
                ),
                "lang": pa.array(
                    ["en", None, "en", "de", "en", "en", "fr", "en", "en",
                     "en", "en", "en"],
                    pa.string(),
                ),
                "source": pa.array(
                    ["s1", "s1", None, "s2", "s1", "s2", "s3", "s1", "s1",
                     "s2", "s1", "s1"],
                    pa.string(),
                ),
                "n_chars": pa.array(
                    [0, 0, 3, 4, 30, 30, 30, 23, 22, 31, 30, 23], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    return d


@pytest.fixture(scope="session")
def adv_emb_dir(tmp_path_factory):
    """Adversarial embeddings: NULL id, NULL/empty/ragged/zero vectors —
    the schema-drift shapes load_vectors' quarantine contract exists for."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_emb")
    dim = 8
    base = [[float(i + 1 + j) for j in range(dim)] for i in range(20)]
    # vec_id 3 appears twice byte-identically (re-ingest duplicate, r08
    # family #10): slice audits must count it once, pair contracts never
    # pair it with itself
    vecs = base + [None, [], [0.0] * dim, [1.0, 2.0], base[0][:], base[3][:]]
    ids = list(range(24)) + [None, 3]
    labels = [i % 3 for i in range(24)] + [None, 0]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    return d


@pytest.fixture(scope="session")
def adv_events_dir(tmp_path_factory):
    """Adversarial events: NULL keys/timestamps/types/values, duplicate
    ids, tie timestamps, malformed props JSON — the degenerate shapes the
    r06 sweep used to find the ANSI-division, JSON-oracle, NULL-ts-window
    and lake parity-split bugs."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_events")
    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return None if minutes is None else t0 + dt.timedelta(minutes=minutes)

    rows = [
        (0, 0, 1, "signup", 10.0, '{"k": 1}'),
        (1, 5, 1, "view", 20.5, '{"k": 2}'),
        (2, 10, 1, "purchase", 99.9, '{"k": 3}'),
        (3, 10, 1, "purchase", 99.9, '{"k": 3}'),
        (4, 0, 2, "signup", 1.0, "not json"),
        (5, 90, 2, "view", None, None),
        (6, 200, 2, "purchase", -5.0, '{"k": -1}'),
        (7, None, 3, "view", 3.0, '{"k": 4}'),
        (8, 30, None, "view", 4.0, '{"k": 5}'),
        (9, 40, 3, None, 5.0, '{"k": 6}'),
        (None, 50, 3, "error", 6.0, '{"k": 7}'),
        (10, 50, 3, "error", 6.0, '{"k": 7}'),
        (11, 60, 4, "signup", 7.0, "{}"),
        (12, 24 * 60 + 1, 4, "view", 8.0, '{"k": 8}'),
        (13, 7 * 24 * 60, 4, "purchase", 9.0, '{"k": 9}'),
        # byte-identical re-ingest duplicate of event 2 (r08 family #10)
        (2, 10, 1, "purchase", 99.9, '{"k": 3}'),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([ts(r[1]) for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        d / "events.parquet",
    )
    return d
