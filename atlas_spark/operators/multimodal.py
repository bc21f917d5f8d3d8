"""Multimodal column plumbing.

Images/audio/video are opaque `binary` columns plus typed metadata.  The
decode/feature-extraction step runs as Arrow-batched pandas functions via
`mapInPandas` — the Spark-side plumbing (schema, batching, partitioning)
is real.  The codec is capability-gated: `PilDecoder` (real PIL decode /
resize / frame iteration) is used where PIL is importable, with the
deterministic `FakeDecoder` as the fallback; the registered driver
queries always use the fake so their DuckDB oracles stay exact over the
synthetic text-byte payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession


class FakeDecoder:
    """Deterministic stand-in for an image/audio codec.

    Real deployments plug in PIL / torchaudio / decord here.  The stub
    derives "features" from the raw bytes so tests exercise the full
    Arrow round trip with verifiable output.
    """

    @staticmethod
    def decode(payload: bytes) -> dict:
        import hashlib

        h = hashlib.sha256(payload).hexdigest()
        return {
            "n_bytes": len(payload),
            "digest": h,
            # fake "width/height" derived from the digest so downstream
            # schema handling is exercised
            "width": int(h[:4], 16) % 1024,
            "height": int(h[4:8], 16) % 1024,
        }

    @staticmethod
    def resize(payload: bytes, w: int, h: int) -> bytes:  # pragma: no cover
        raise NotImplementedError("image resize requires a codec library")

    @staticmethod
    def frame_sample(payload: bytes, every_n: int) -> list[bytes]:  # pragma: no cover
        raise NotImplementedError("video frame sampling requires a codec library")


class PilDecoder:
    """Real image codec backed by PIL, used when the library is importable.

    Capability-gated: `PilDecoder.available()` checks for PIL without
    importing it at module load (executors only pay the import inside the
    Arrow batch function).  The registered driver-contract queries stay on
    `FakeDecoder` regardless — their payloads are synthetic text bytes and
    their DuckDB oracles reproduce the fake byte math — so the real codec
    is opt-in per call via the `decoder=` parameter.
    """

    @staticmethod
    def available() -> bool:
        import importlib.util

        return importlib.util.find_spec("PIL") is not None

    @staticmethod
    def decode(payload: bytes) -> dict:
        import hashlib
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            w, h = im.size
        return {
            "n_bytes": len(payload),
            "digest": hashlib.sha256(payload).hexdigest(),
            "width": w,
            "height": h,
        }

    @staticmethod
    def resize(payload: bytes, w: int, h: int) -> bytes:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            out = io.BytesIO()
            im.resize((w, h)).save(out, format="PNG")
            return out.getvalue()

    @staticmethod
    def frame_sample(payload: bytes, every_n: int) -> list[bytes]:
        import io

        from PIL import Image, ImageSequence

        frames: list[bytes] = []
        with Image.open(io.BytesIO(payload)) as im:
            for i, frame in enumerate(ImageSequence.Iterator(im)):
                if i % every_n:
                    continue
                out = io.BytesIO()
                frame.convert("RGB").save(out, format="PNG")
                frames.append(out.getvalue())
        return frames


def default_decoder():
    """The best decoder this environment supports: PIL when importable,
    the deterministic fake otherwise."""
    return PilDecoder if PilDecoder.available() else FakeDecoder


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an opaque-binary media table from documents (payload =
    utf-8 bytes).  In production this is a parquet/iceberg table with a
    real binary column."""
    from ..util.io import read_parquet

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )


def decode_features(media: DataFrame, decoder=FakeDecoder) -> DataFrame:
    """Feature extraction over a `(doc_id, payload binary)` frame via
    Arrow-batched `mapInPandas` — one python worker call per batch, not
    per row.  `decoder` is any object with the FakeDecoder interface
    (e.g. `PilDecoder` where PIL is installed)."""
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder.decode(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "n_bytes", "digest", "width", "height"]]

    return media.mapInPandas(extract, schema=MEDIA_SCHEMA)


def extract_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract entry: deterministic FakeDecoder over the synthetic
    text-byte payloads (the DuckDB oracle reproduces its byte math)."""
    return decode_features(media_table(spark, sf_dir), decoder=FakeDecoder)


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("chunk_idx", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)


def frame_sample(spark: SparkSession, sf_dir: str, chunk: int = 64) -> DataFrame:
    """Frame-sampling shape: each binary payload fans out to N fixed-size
    chunk rows ("frames") with per-chunk features — the 1->N row shape of
    video frame extraction, via Arrow-batched `mapInPandas`.

    The decode itself is the deterministic FakeDecoder (no codec libs in
    this environment); the Spark-side plumbing (schema, batching, fan-out)
    is real and oracle-checked.
    """
    import hashlib

    import pandas as pd

    media = media_table(spark, sf_dir)

    def explode_chunks(batches):
        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "n_bytes": [], "digest": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), chunk):
                    piece = b[i : i + chunk]
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(i // chunk)
                    out["n_bytes"].append(len(piece))
                    out["digest"].append(hashlib.sha256(piece).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(explode_chunks, schema=CHUNK_SCHEMA)


# documents text is ascii (single-byte chars), so char slicing == byte
# slicing and the SQL oracle can reproduce the chunking exactly
FRAME_SAMPLE_SQL = """
WITH n AS (
  SELECT doc_id, text, CAST(ceil(greatest(len(text), 1) / 64.0) AS BIGINT) AS n_chunks
  FROM documents
)
SELECT doc_id,
       i AS chunk_idx,
       CAST(len(substr(text, 1 + i * 64, 64)) AS BIGINT) AS n_bytes,
       sha256(substr(text, 1 + CAST(i AS INTEGER) * 64, 64)) AS digest
FROM n, unnest(range(n_chunks)) AS u(i)
"""


EXTRACT_MEDIA_SQL = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       sha256(text) AS digest,
       CAST(CAST('0x' || substr(sha256(text), 1, 4) AS INTEGER) % 1024 AS BIGINT) AS width,
       CAST(CAST('0x' || substr(sha256(text), 5, 4) AS INTEGER) % 1024 AS BIGINT) AS height
FROM documents
"""


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)


def resize_payloads(
    media: DataFrame, width: int, height: int, decoder=None
) -> DataFrame:
    """Resize shape: binary in -> binary OUT through the Arrow boundary —
    the one plumbing direction decode/frame-sample don't cover.

    With a `decoder` (e.g. `PilDecoder`), each payload is decoded, resized
    to (width, height), and re-encoded.  Without one, the deterministic
    fake truncates/right-pads the payload to exactly width*height bytes —
    same batch shape, binary output column, and per-row metadata, all
    oracle-checkable.
    """
    import hashlib

    import pandas as pd

    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": [], "n_bytes": [], "digest": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if decoder is not None:
                    b = decoder.resize(bytes(payload), width, height)
                else:
                    b = bytes(payload)[:target].ljust(target, b"0")
                out["doc_id"].append(doc_id)
                out["payload"].append(b)
                out["n_bytes"].append(len(b))
                out["digest"].append(hashlib.sha256(b).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


def resize_media(
    spark: SparkSession, sf_dir: str, width: int = 16, height: int = 8
) -> DataFrame:
    """Driver-contract entry: fake resize over the synthetic text-byte
    payloads (real image bytes would go through `resize_payloads(...,
    decoder=default_decoder())`)."""
    return resize_payloads(media_table(spark, sf_dir), width, height)


def resize_media_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract projection of `resize_media` (the binary payload
    itself is asserted in unit tests; the oracle checks size + digest)."""
    return resize_media(spark, sf_dir).select("doc_id", "n_bytes", "digest")


# ascii corpus: char ops == byte ops, so rpad/substr reproduce the fake
# codec exactly
RESIZE_MEDIA_SQL = """
SELECT doc_id,
       CAST(128 AS BIGINT) AS n_bytes,
       sha256(rpad(substr(text, 1, 128), 128, '0')) AS digest
FROM documents
"""
