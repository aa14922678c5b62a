"""sf1 scale evidence for the streaming maintenance jobs (VERDICT r07
item 4): drive ``maintain_dedup_index`` / ``curate_stream`` /
``maintain_ivf_index`` over the sf1 feed in incremental triggers and
record per-trigger wall time and state size — the measured backing for
the "per-trigger work is O(batch), never O(corpus)" claims in
streaming/jobs.py.

Protocol: the sf1 table (tools/make_sf1.py) is split into 10 chunk
files; each trigger drops ONE new chunk into the feed directory and
re-runs the job with ``availableNow`` against a persistent checkpoint,
so Spark's file source processes exactly the new chunk — the
periodic-incremental-batch deployment shape. Healthy scaling = flat
per-trigger wall while state grows 10×; an O(corpus) regression shows
up as wall growing with trigger number.

Prints one markdown table per job for BENCH_NOTES.

Usage: python tools/streaming_sf1.py [sf1_dir] [work_root]
       (defaults /tmp/sf1 /tmp/sf1_stream)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

CHUNKS = 10


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _split(src: str, out_dir: str, stem: str) -> list[str]:
    import pyarrow.parquet as pq
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(src)
    n = t.num_rows
    step = (n + CHUNKS - 1) // CHUNKS
    paths = []
    for i in range(CHUNKS):
        p = os.path.join(out_dir, f"{stem}_{i:02d}.parquet")
        pq.write_table(t.slice(i * step, step), p)
        paths.append(p)
    return paths


def main() -> None:
    from pyspark.sql import SparkSession

    from activecube_graphql_spark.session import ensure_runtime_confs
    from activecube_graphql_spark.streaming import jobs

    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_stream"
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)

    spark = ensure_runtime_confs(
        SparkSession.builder
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("streaming_sf1").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    doc_chunks = _split(os.path.join(sf1, "documents.parquet"),
                        os.path.join(root, "staging_docs"), "documents")
    emb_chunks = _split(os.path.join(sf1, "embeddings.parquet"),
                        os.path.join(root, "staging_emb"), "embeddings")

    def run(job_name: str, chunks: list[str], feed: str, state: str,
            ckpt: str, trigger_fn, state_table: str) -> None:
        os.makedirs(feed, exist_ok=True)
        print(f"\n### {job_name}\n")
        print("| trigger | batch rows | wall s | state rows | state MB |")
        print("|---|---|---|---|---|")
        import pyarrow.parquet as pq
        for i, chunk in enumerate(chunks):
            shutil.copy(chunk, feed)
            batch_rows = pq.read_metadata(chunk).num_rows
            t0 = time.perf_counter()
            trigger_fn(feed, state, ckpt)
            wall = time.perf_counter() - t0
            srows = spark.read.parquet(state_table.format(state=state)) \
                .count()
            smb = _du(state) / 1e6
            print(f"| {i + 1} | {batch_rows} | {wall:.2f} | {srows} | "
                  f"{smb:.1f} |", flush=True)

    # 1) exact-dedup fingerprint index over the document feed
    run("maintain_dedup_index (sf1 documents, 10 triggers)",
        doc_chunks,
        os.path.join(root, "feed_dedup"),
        os.path.join(root, "dedup_index"),
        os.path.join(root, "ckpt_dedup"),
        lambda feed, state, ckpt: jobs.maintain_dedup_index(
            spark, feed, state, ckpt, glob="documents_*.parquet"),
        "{state}")

    # 2) full curation (quality rules + dedup) into the curated corpus
    run("curate_stream (sf1 documents, 10 triggers)",
        doc_chunks,
        os.path.join(root, "feed_curate"),
        os.path.join(root, "curated"),
        os.path.join(root, "ckpt_curate"),
        lambda feed, state, ckpt: jobs.curate_stream(
            spark, feed, state, ckpt, glob="documents_*.parquet"),
        "{state}")

    # 3) IVF index maintenance over the vector feed (built on chunk 0)
    from activecube_graphql_spark.operators.similarity import \
        build_ivf_index
    ivf_path = os.path.join(root, "ivf_index")
    base = spark.read.parquet(emb_chunks[0])
    t0 = time.perf_counter()
    build_ivf_index(base, ivf_path, n_cells=16)
    print(f"\nbuild_ivf_index over chunk 0 "
          f"({base.count()} vecs): {time.perf_counter() - t0:.2f} s")
    run("maintain_ivf_index (sf1 embeddings, 9 extend triggers)",
        emb_chunks[1:],
        os.path.join(root, "feed_ivf"),
        ivf_path,
        os.path.join(root, "ckpt_ivf"),
        lambda feed, state, ckpt: jobs.maintain_ivf_index(
            spark, feed, state, ckpt, glob="embeddings_*.parquet"),
        "{state}/cells.parquet")

    spark.stop()


if __name__ == "__main__":
    main()
