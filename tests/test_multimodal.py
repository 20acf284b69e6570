"""Multimodal stage tests: real Arrow plumbing, stubbed codecs."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from cheque_ocr_project_ray.media import encode_image
from cheque_ocr_project_ray.multimodal.stages import (
    AudioFeatureStage,
    FrameSampleStage,
    ImageDecodeStage,
    ImageResizeStage,
    MediaEmbedStage,
    VariantBestOfStage,
)


@pytest.fixture(scope="module")
def media_table():
    rows = []
    for i in range(6):
        payload = encode_image([(f"LINE {i}", 0.9), ("FOR ACME", 0.8)],
                               1600 + i * 100, 700, 9000 + i * 500, seed=i)
        rows.append({"media_ref": f"b000/doc_{i}", "data": payload,
                     "width": 1600 + i * 100, "height": 700})
    rows.append({"media_ref": "b000/raw", "data": b"\x89PNG fakebytes" * 100,
                 "width": 10, "height": 10})
    return pa.Table.from_pylist(rows)


def test_image_decode_stage(media_table):
    out = ImageDecodeStage()(media_table)
    d = out.to_pydict()
    assert d["format"][:6] == ["chq1"] * 6 and d["format"][6] == "unknown"
    assert d["n_text_lines"][:6] == [2] * 6
    assert d["width"][0] == 1600 and d["height"][0] == 700
    assert all(n > 0 for n in d["nbytes"])


def test_image_decode_strict_raises(media_table):
    with pytest.raises(NotImplementedError, match="cv2/PIL"):
        ImageDecodeStage(strict=True)(media_table)


def test_variant_bestof_stage(media_table):
    out = VariantBestOfStage()(media_table)
    d = out.to_pydict()
    # every decodable image scanned all 4 ROIs x 3 variants and picked
    # one; the undecodable payload had nothing to evaluate
    assert d["n_evaluated"] == [12] * 6 + [0]
    assert all(r.startswith("ROI_") for r in d["best_roi"][:6])
    assert all(v in VariantBestOfStage.VARIANTS for v in d["best_variant"][:6])
    # modifier is in [0.85, 1.0): best_conf near but never above base mean
    base = (0.9 + 0.8) / 2
    assert all(0.85 * base <= c < base for c in d["best_conf"][:6])
    # undecodable payload -> no candidate survives the validity gate
    assert d["best_roi"][6] == "NONE" and d["best_conf"][6] == 0.0
    # deterministic selection
    again = VariantBestOfStage()(media_table).to_pydict()
    assert again == d


def test_image_resize_stage(media_table):
    out = ImageResizeStage(target_long_side=800)(media_table).to_pydict()
    assert out["processed_w"][0] == 800           # 1600 → 800 (scale 0.5)
    assert out["processed_h"][0] == 350
    assert abs(out["scale_factor"][0] - 0.5) < 1e-9


def test_frame_sample_stage(media_table):
    out = FrameSampleStage(every_n=2, max_frames=3,
                           bytes_per_frame=1024)(media_table).to_pydict()
    assert all(n <= 3 for n in out["n_sampled"])
    assert out["frame_offsets"][0][0] == 0        # always starts at frame 0
    # deterministic
    again = FrameSampleStage(every_n=2, max_frames=3,
                             bytes_per_frame=1024)(media_table).to_pydict()
    assert out["frame_offsets"] == again["frame_offsets"]


def test_audio_feature_stage(media_table):
    out = AudioFeatureStage(window_bytes=2048)(media_table).to_pydict()
    assert all(n >= 1 for n in out["n_windows"])
    assert all(0.0 <= f <= 1.0 for row in out["features"] for f in row)


def test_media_embed_stage(media_table):
    out = MediaEmbedStage(dim=16)(media_table).to_pydict()
    for vec in out["embedding"]:
        assert len(vec) == 16
        assert abs(np.linalg.norm(vec) - 1.0) < 1e-5
    again = MediaEmbedStage(dim=16)(media_table).to_pydict()
    assert out["embedding"] == again["embedding"]


def test_roi_crop_plan(media_table):
    from cheque_ocr_project_ray.multimodal.stages import RoiCropPlanStage
    out = RoiCropPlanStage()(media_table)
    assert out.num_rows == media_table.num_rows * 4
    d = out.to_pydict()
    # first image 1600x700: issuer zone = [0.40h:0.90h, 0.35w:w]
    assert (d["roi"][0], d["y0"][0], d["y1"][0], d["x0"][0], d["x1"][0]) \
        == ("issuer_zone", 280, 630, 560, 1600)
    assert d["roi"][3] == "full_image" and d["cascade_order"][3] == 3


def test_handwriting_detect(media_table):
    from cheque_ocr_project_ray.multimodal.stages import HandwritingDetectStage
    out = HandwritingDetectStage()(media_table).to_pydict()
    assert len(out["handwritten"]) == media_table.num_rows
    assert all(isinstance(v, bool) for v in out["handwritten"])
    again = HandwritingDetectStage()(media_table).to_pydict()
    assert out == again  # deterministic
    with pytest.raises(NotImplementedError, match="cv2"):
        HandwritingDetectStage(strict=True)(media_table)


def test_stages_in_ray_pipeline(media_table):
    """The actor-pool plumbing end-to-end in a real Dataset."""
    ds = ray.data.from_arrow(media_table)
    decoded = ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
                             batch_size=4, concurrency=2, num_cpus=1)
    pdf = decoded.to_pandas()
    assert len(pdf) == media_table.num_rows
    assert set(pdf["format"]) == {"chq1", "unknown"}


def test_media_size_quantiles_matches_numpy():
    """Grid quantiles equal direct numpy quantile_cont over the raw
    sizes (linear interpolation), per format."""
    import numpy as np
    import pyarrow.dataset as pads
    from cheque_ocr_project_ray.fixtures.gen import ensure_fixture
    from cheque_ocr_project_ray.multimodal.queries import (
        media_size_quantiles)

    out = media_size_quantiles("/root/testdata/sf0.001")
    fixture = ensure_fixture("/root/testdata/sf0.001")
    t = pads.dataset(f"{fixture}/media").to_table(columns=["data"])
    payloads = t.column("data").to_pylist()
    by_fmt = {"chq1": [], "unknown": []}
    for d in payloads:
        by_fmt["chq1" if d[:5] == b"CHQ1\n" else "unknown"].append(len(d))
    assert out["n"].sum() == len(payloads)
    for fmt, sizes in by_fmt.items():
        if not sizes:
            continue
        row = out[out["format"] == fmt].iloc[0]
        sizes = np.array(sizes, dtype="float64")
        assert row["n"] == len(sizes)
        for q, col in ((0.5, "p50_bytes"), (0.9, "p90_bytes"),
                       (0.99, "p99_bytes")):
            assert row[col] == np.quantile(sizes, q, method="linear")
