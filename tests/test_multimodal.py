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
