"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL and tested — schema, Arrow batch shape,
mapInPandas partitioning, deterministic feature output.  The actual
image/audio decode is STUBBED: the container ships no codec libraries, so
``_decode_blob`` either raises NotImplementedError (strict mode) or emits a
deterministic fake feature derived from the bytes (default).  Swapping in a
real decoder (PIL/librosa/ffmpeg) changes ONE function, nothing in the plan.

Scale design: feature extraction is mapInPandas over the binary column —
embarrassingly parallel, no shuffle; the output schema carries the feature
as array<float> ready for the similarity operators.
"""

from __future__ import annotations

import hashlib

FEATURE_DIM = 8

OUT_SCHEMA = (
    "id long, mime string, n_bytes int, decode_status string, "
    f"feature array<float>"
)


def _decode_blob(blob: bytes, mime: str, strict: bool = False) -> list[float]:
    """STUB decode: deterministic pseudo-feature from the raw bytes.

    Real implementation would be: image -> resize -> pixel stats / model
    embedding; audio -> frames -> spectral features.  The stub hashes the
    bytes into FEATURE_DIM floats in [0, 1) so downstream plumbing
    (similarity search, dedup) is exercised with stable values.
    """
    if strict:
        raise NotImplementedError(
            f"no codec for {mime} in this environment — plug a real decoder here"
        )
    h = hashlib.blake2b(blob, digest_size=FEATURE_DIM * 4).digest()
    return [
        int.from_bytes(h[i * 4 : (i + 1) * 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    df,
    blob_col: str = "blob",
    mime_col: str = "mime",
    id_col: str = "id",
    strict: bool = False,
):
    """binary column -> (id, mime, n_bytes, decode_status, feature)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                blob = r[blob_col]
                try:
                    feat = _decode_blob(bytes(blob), r[mime_col], strict=strict)
                    status = "stubbed"
                except NotImplementedError:
                    feat = None
                    status = "no_codec"
                rows.append(
                    (int(r[id_col]), r[mime_col],
                     len(blob) if blob is not None else 0, status, feat)
                )
            yield pd.DataFrame(
                rows, columns=["id", "mime", "n_bytes", "decode_status", "feature"]
            )

    return df.select(id_col, blob_col, mime_col).mapInPandas(gen, schema=OUT_SCHEMA)
