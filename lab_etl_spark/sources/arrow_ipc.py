"""Arrow IPC (Feather V2) shard source/sink.

Arrow IPC files are the zero-copy interchange format ML data loaders
mmap directly (PyTorch/JAX loader stacks, DuckDB, Polars, pandas all
read them natively) — the columnar sibling of the WebDataset tar shards
(sources/webdataset.py).  Spark has no built-in Arrow *file* codec even
though its Python exchange layer is Arrow, so both directions run as
Arrow-batched ``mapInPandas`` kernels: the writer turns each partition
into one ``.arrow`` shard (RecordBatchFile layout), the reader fans one
``binaryFile`` row per shard into record batches.  The unit of work is a
FILE, not a row — the same justification as the multimodal decoders.

Scale shape: shards write one-per-partition with no shuffle beyond the
explicit repartition that sets the shard count; reads parallelize per
shard.  Shard size is the partition size — the knob a 100 TB export job
tunes against the downstream loader's memory map granularity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: physical schema of the events shards (timestamps kept tz-naive
#: microseconds end to end, so write→read is bit-lossless)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long,"
    " event_type string, value double, props string"
)


def write_arrow_ipc(df: DataFrame, out_dir: str, n_shards: int = 8) -> int:
    """Write ``df`` as ``n_shards`` Arrow IPC files; returns rows written."""
    os.makedirs(out_dir, exist_ok=True)

    def shard_writer(pdfs):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.ipc as ipc
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"shard-{pid:05d}.arrow")
        writer = None
        n = 0
        for pdf in pdfs:
            table = pa.Table.from_pandas(pdf, preserve_index=False)
            if writer is None:
                writer = ipc.new_file(path, table.schema)
            writer.write_table(table)
            n += len(pdf)
        if writer is not None:
            writer.close()
        elif not os.path.exists(path):
            # empty partition still emits a valid empty shard so the
            # shard count equals the partition count deterministically
            empty = pa.Table.from_pandas(
                pd.DataFrame(), preserve_index=False
            )
            with ipc.new_file(path, empty.schema):
                pass
        yield pd.DataFrame({"n": [n]})

    counts = (
        df.repartition(n_shards)
        .mapInPandas(shard_writer, "n long")
        .collect()
    )
    return sum(r["n"] for r in counts)


def read_arrow_ipc(spark: SparkSession, in_dir: str, schema: str) -> DataFrame:
    """Distributed Arrow IPC reader: one ``binaryFile`` row per shard,
    decoded to record batches executor-side (bytes never hit the driver)."""

    def shard_reader(pdfs):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        for pdf in pdfs:
            for content in pdf["content"]:
                reader = ipc.open_file(pa.BufferReader(content))
                for i in range(reader.num_record_batches):
                    yield reader.get_batch(i).to_pandas()

    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.arrow")
        .load(in_dir)
        .select("content")
    )
    return shards.mapInPandas(shard_reader, schema)
