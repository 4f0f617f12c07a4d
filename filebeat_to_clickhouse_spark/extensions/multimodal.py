"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads live in ``binary`` columns alongside a
typed metadata struct (modality, media type, byte length, content digest).
Heavy per-item work (decode, resize, frame-sample, feature-extract) runs as
Arrow-batched ``mapInPandas`` over the binary column — the Spark-side
contract (schema, batching, partitioning) is real and tested here, while
the codec step itself is STUBBED (no image/audio libraries in this
container): ``decode_stub`` raises NotImplementedError unless
``fake=True``, which produces a deterministic fake feature vector so the
pipeline shape can be tested end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_META_FIELDS = ("modality", "media_type", "n_bytes", "sha256_hex")

#: Rows per Arrow batch for the pandas decode path. At 100 TB tune so one
#: batch of payloads fits comfortably in executor memory (payload_size ×
#: batch ≤ ~64 MB); set via spark.sql.execution.arrow.maxRecordsPerBatch.
DEFAULT_ARROW_BATCH = 256

DECODED_SCHEMA = "doc_id bigint, n_bytes int, feature array<float>"


def with_binary_payload(
    df: DataFrame,
    source_col: str,
    modality: str = "text",
    media_type: str = "text/plain; charset=utf-8",
    payload_col: str = "payload",
) -> DataFrame:
    """Attach an opaque binary payload + metadata struct from a source column.

    For real media the payload arrives already-binary from the source
    (parquet/avro binary, object-store bytes); here any column is cast.
    """
    payload = F.col(source_col).cast("binary")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).alias("n_bytes"),
        F.lower(F.sha2(payload, 256)).alias("sha256_hex"),
    )
    return df.withColumn(payload_col, payload).withColumn("media_meta", meta)


def binary_meta_table(docs: DataFrame, source_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Flat metadata projection over the payload column — the query-surface
    form of the multimodal schema (binary stays columnar, pruned away unless
    selected)."""
    with_payload = with_binary_payload(docs, source_col)
    return with_payload.select(
        F.col(id_col),
        F.col("media_meta.modality").alias("modality"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.sha256_hex").alias("sha256_hex"),
    )


def decode_stub(payload: bytes, fake: bool = False) -> list[float]:
    """STUB codec. Real deployments plug PIL/torchaudio/decord here.

    fake=True → deterministic 8-dim feature from payload bytes (for tests).
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic test codec"
        )
    acc = [0] * 8
    for i, b in enumerate(payload):
        acc[i % 8] = (acc[i % 8] + b) % 997
    return [float(x) for x in acc]


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
    codec=None,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    mapInPandas streams record batches through Python once — the payload
    bytes never round-trip through the JVM row format twice, and upstream
    column pruning means ONLY (id, payload) columns are read from storage.

    ``codec`` is the REAL plug point: any ``bytes -> list[float]``
    callable (PIL + a feature head, torchaudio, a pure-Python parser) is
    cloudpickled by value into the workers and applied per payload —
    proven e2e in tests with an actual PPM(P6) pixel decoder, so the
    contract does not rest on the fake path alone. Precedence:
    ``codec`` if given, else the deterministic fake when ``fake=True``,
    else raise (no media libraries ship in this environment).
    """
    # NOTE: the worker function must be self-contained (no references to this
    # module) so cloudpickle ships it by value — Python workers do not have
    # the engine package on their import path.
    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        def _decode(p: bytes) -> list[float]:
            if codec is not None:
                return [float(x) for x in codec(p)]
            if not fake:
                raise NotImplementedError(
                    "media codecs are not available in this environment; "
                    "pass codec=<bytes -> list[float]> or fake=True for "
                    "the deterministic test codec"
                )
            # Vectorized form of the running (acc + b) % 997 per residue
            # class — mod commutes with the sum, so values are identical to
            # the scalar loop in decode_stub.
            a = np.frombuffer(p, dtype=np.uint8)
            pad = (-len(a)) % 8
            if pad:
                a = np.concatenate([a, np.zeros(pad, np.uint8)])
            return (a.reshape(-1, 8).sum(0, dtype=np.int64) % 997).astype(float).tolist()

        for pdf in batches:
            feats = pdf[payload_col].map(lambda p: _decode(bytes(p)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=DECODED_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"

#: Stub frame size. A real codec replaces the fixed-width byte slicing with
#: container-aware decode (decord/ffmpeg); every Spark-side contract —
#: schema, one-to-many row fanout, Arrow batching — is identical.
STUB_FRAME_BYTES = 32


def frame_sample(
    df: DataFrame,
    every_n: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
    codec=None,
) -> DataFrame:
    """Sample every Nth frame from video payloads → one row per kept frame.

    One-to-many mapInPandas fanout: the payload crosses into Python once per
    batch, frames come back as rows. ``codec`` is the real plug point: a
    ``bytes -> list[bytes]`` container demuxer (decord/ffmpeg) returning
    the full frame list, which the operator then samples every Nth of —
    the fanout/sampling contract stays engine-side. ``fake=True`` slices
    fixed 32-byte pseudo-frames instead; with neither, raise (codecs not
    shipped in this environment).
    """

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if codec is None and not fake:
                raise NotImplementedError(
                    "video codecs are not available in this environment; "
                    "pass codec=<bytes -> list[bytes]> or fake=True for "
                    "the deterministic test codec"
                )
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if codec is not None:
                    decoded = codec(data)
                else:
                    n_frames = len(data) // STUB_FRAME_BYTES
                    decoded = [
                        data[i * STUB_FRAME_BYTES : (i + 1) * STUB_FRAME_BYTES]
                        for i in range(n_frames)
                    ]
                for i in range(0, len(decoded), every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(decoded[i])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, width int, height int, resized binary"


def resize_images(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
    codec=None,
) -> DataFrame:
    """Resize image payloads to (width, height) → resized payload rows.

    ``codec`` is the real plug point: a ``(bytes, width, height) ->
    bytes`` resizer (PIL's decode→resize→tobytes) — same schema, same
    one-row-per-image shape, proven e2e in tests with a pure-Python PPM
    pixel resizer. ``fake=True`` nearest-neighbor-samples the raw bytes
    to exactly width×height bytes (deterministic); with neither, raise.
    """

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if codec is None and not fake:
                raise NotImplementedError(
                    "image codecs are not available in this environment; "
                    "pass codec=<(bytes, w, h) -> bytes> or fake=True for "
                    "the deterministic test codec"
                )
            out = []
            for payload in pdf[payload_col]:
                if codec is not None:
                    out.append(bytes(codec(bytes(payload), width, height)))
                    continue
                data = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(data) == 0:
                    data = np.zeros(1, dtype=np.uint8)
                idx = (np.arange(width * height) * len(data)) // (width * height)
                out.append(data[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "resized": out,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZED_SCHEMA)
