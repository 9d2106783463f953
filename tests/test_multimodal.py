"""Multimodal operator unit tests (image-resize pooling math)."""

def test_image_resize_pooling_math(spark):
    """4 known bytes per 2x2 block must mean-pool to the exact float64 value;
    payloads shorter than the grid zero-pad."""
    import numpy as np

    from duckdb_ml_spark.operators.multimodal import IMG_SIDE, POOL, decode_image_resized

    payload = bytes(range(IMG_SIDE * IMG_SIDE))  # bytes 0..63 in row-major order
    short = b"\xff\xff"  # pads the rest of the grid with zeros
    df = spark.createDataFrame([(1, payload), (2, short)], "doc_id bigint, media binary")
    got = {(r.doc_id, r.r, r.c): r.v for r in decode_image_resized(df).collect()}
    f32 = lambda b: float(np.float32(np.float32(b) / np.float32(255.0)))
    for r in range(IMG_SIDE // POOL):
        for c in range(IMG_SIDE // POOL):
            vals = [
                f32(payload[(r * POOL + dr) * IMG_SIDE + (c * POOL + dc)])
                for dr in range(POOL)
                for dc in range(POOL)
            ]
            assert got[(1, r, c)] == sum(vals) / 4.0
    assert got[(2, 0, 0)] == (f32(255) + f32(255) + 0.0 + 0.0) / 4.0
    assert got[(2, 3, 3)] == 0.0


def test_real_codec_seam(spark, sf_dir):
    """fake=None decodes real images through PIL when available (VERDICT r2 #6);
    without PIL on the worker it must raise a clean NotImplementedError."""
    import pytest

    from duckdb_ml_spark.operators.multimodal import _DECODE_DIM, decode_media

    try:
        import io

        import numpy as np
        from PIL import Image

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil:
        from duckdb_ml_spark.tables import load

        docs = load(spark, sf_dir, "documents").limit(4)
        from pyspark.sql import functions as F

        media = docs.select("doc_id", F.encode("text", "UTF-8").alias("media"))
        with pytest.raises(Exception) as ei:
            decode_media(media, fake=None).collect()
        assert "NotImplementedError" in str(ei.value) or "decode unavailable" in str(
            ei.value
        )
        return

    # PIL present: build two tiny real PNGs and decode through the seam
    def png_bytes(shade):
        img = Image.new("L", (8, 8), color=shade)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, bytearray(png_bytes(0))), (2, bytearray(png_bytes(255)))]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r.doc_id: r for r in decode_media(media, fake=None).collect()}
    assert len(out[1].features) == _DECODE_DIM
    assert np.allclose(out[1].features, 0.0)
    assert np.allclose(out[2].features, 1.0)
