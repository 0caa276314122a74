"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_image`` raises NotImplementedError unless PIL is importable, and
``fake_decode_meta`` supplies a deterministic stand-in) — but the Spark-side
plumbing is real and tested: schema contracts, binary payload handling,
Arrow batch iteration, and partition-parallel UDF execution are exactly
what a codec-enabled cluster would run.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import spread_small_input

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, n_bytes long"
)
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, n_frames long"
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Wrap a text column as a binary media payload + typed metadata —
    the ingestion shape for opaque media blobs (here UTF-8 bytes stand in
    for image bytes; at scale this is the parquet BINARY column as-is)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    # downstream consumers are Arrow-batched mapInPandas ops — spread a
    # sub-parallelism input now so Python workers run in parallel
    df = spread_small_input(df)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    n_frames) from the payload bytes. Replace with PIL/ffmpeg on a
    codec-enabled cluster.

    "width" comes from the first CHARACTER's codepoint (payloads here are
    UTF-8 text stand-ins), matching the oracle's ``ascii(substr(text,1,1))``
    exactly even when the text leads with a multibyte char (first-BYTE
    semantics would diverge: ascii('北')=21271 vs 0xE5=229 — r10
    adversarial pin)."""
    n = len(payload)
    first = ord(payload.decode("utf-8")[0]) if n else 0
    return 16 + first % 64, 16 + n % 64, 1 + n % 8


def decode_image(payload: bytes):
    """Real decode path — gated on an optional codec dependency."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "image decode requires pillow; use fake_decode_meta for plumbing"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: Arrow
    batches in, per-row byte access, Arrow batches out. The decode call is
    the stub; the batch shape, schema, and partition parallelism are the
    production path."""
    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            # NULL payload (e.g. NULL source text) -> NULL metadata row,
            # never a worker crash — a 1000-executor decode job must not
            # abort on one undecodable blob (r10 adversarial pin; the
            # oracle's encode(NULL)/ascii(NULL) yield NULL the same way).
            feats = pdf["payload"].map(
                lambda b: (None, None, None, None) if b is None
                else (len(b),) + fake_decode_meta(b)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        feats.map(lambda t: t[0]), dtype="Int64"),
                    "width": pd.array(
                        feats.map(lambda t: t[1]), dtype="Int64"),
                    "height": pd.array(
                        feats.map(lambda t: t[2]), dtype="Int64"),
                    "n_frames": pd.array(
                        feats.map(lambda t: t[3]), dtype="Int64"),
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, out_w long, out_h long, n_bytes_out long, payload binary"
)
FRAMES_SCHEMA = "doc_id long, n_frames long, sampled array<long>"


def resize_images(media: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Resize plumbing via mapInPandas: payload in, resized payload out.

    The stub "resize" crops/keeps the first out_w*out_h payload bytes
    (deterministic, codec-free); a codec-enabled cluster swaps the body
    for PIL ``Image.resize`` + re-encode without touching the plan, batch
    shape, or schema. Output bytes stay a binary column — chained
    transforms remain one mapInPandas pipeline per partition.
    """
    import pandas as pd

    target = out_w * out_h

    def op(batches):
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: bytes(b[:target]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes_out": resized.map(len).astype("int64"),
                    "payload": resized,
                }
            )

    return media.mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 3) -> DataFrame:
    """Frame-sampling plumbing via mapInPandas: derive the (stub) frame
    count from the payload, keep every k-th frame index. The real path
    replaces the count/extract with an ffmpeg probe + frame decode; the
    Spark contract (binary in, typed array out, per-partition batches)
    is identical."""
    import pandas as pd

    def op(batches):
        for pdf in batches:
            n_frames = pdf["payload"].map(
                lambda b: fake_decode_meta(b)[2]
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": n_frames,
                    "sampled": n_frames.map(
                        lambda n: list(range(0, int(n), every_k))
                    ),
                }
            )

    return media.mapInPandas(op, schema=FRAMES_SCHEMA)


TRANSFORM_SCHEMA = (
    "doc_id long, out_w long, out_h long, n_bytes_out long, "
    "n_frames long, sampled array<long>"
)


def transform_media(
    media: DataFrame, out_w: int = 32, out_h: int = 32, every_k: int = 3
) -> DataFrame:
    """Fused resize + frame-sample in ONE mapInPandas pass — the scale
    shape for chained media transforms. Composing :func:`resize_images`
    and :func:`sample_frames` as separate branches reads (and at scale,
    shuffles) the opaque payload twice and adds a doc_id join; with real
    multi-MB image/video blobs the payload bytes dominate all traffic,
    so every transform that can share one decode must run in the same
    Arrow batch pass. Stub bodies are identical to the per-op versions;
    a codec-enabled cluster swaps them without touching the plan."""
    import pandas as pd

    target = out_w * out_h

    def op(batches):
        for pdf in batches:
            # NULL payloads (a NULL media column at ingestion) pass
            # through as NULL metadata — same as the oracle's closed-form
            # NULL propagation (r10 adversarial pin); nullable Int64
            # keeps the Arrow type long while carrying the NA
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target]) if b is not None else None
            )
            n_frames = pdf["payload"].map(
                lambda b: fake_decode_meta(b)[2] if b is not None else None
            ).astype("Int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes_out": resized.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "n_frames": n_frames,
                    "sampled": n_frames.map(
                        lambda n: (list(range(0, int(n), every_k))
                                   if pd.notna(n) else None)
                    ),
                }
            )

    return media.mapInPandas(op, schema=TRANSFORM_SCHEMA)
