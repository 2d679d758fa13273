"""Evaluator: in-memory scoring, directory protocol, synthetic dataset."""

import numpy as np
import pytest

from dcvgan_tpu.eval.evaluator import Evaluator
from dcvgan_tpu.eval.features import FeatureExtractor


@pytest.fixture(scope="module")
def extractor():
    return FeatureExtractor(seed=0)


def fake_videos(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, 16, 64, 64, 3), dtype=np.uint8)


class ArrayDataset:
    """Minimal dataset stub exposing sample() like VideoDataset."""

    def __init__(self, videos):
        self.videos = videos  # uint8

    def __len__(self):
        return len(self.videos)

    def sample(self, i, rng):
        return {"color": self.videos[i].astype(np.float32) / 127.5 - 1.0}


def test_score_videos_all_metrics(extractor):
    real = fake_videos(8, seed=1)
    ev = Evaluator(
        metrics=["is", "fid", "fvd", "prd"], num_samples=8, batchsize=4,
        dataset=ArrayDataset(real), extractor=extractor,
    )
    scores = ev.score_videos(fake_videos(8, seed=2))
    assert set(scores) == {"is", "fid", "fvd", "prd", "prd_f1_8"}
    assert scores["is"] >= 1.0
    assert scores["fid"] >= 0.0
    assert scores["fid"] == scores["fvd"]
    assert 0.0 <= scores["prd"] <= 1.0


def test_fid_lower_for_same_distribution(extractor):
    real = fake_videos(16, seed=3)
    ev = Evaluator(
        metrics=["fid"], num_samples=16, batchsize=8,
        dataset=ArrayDataset(real), extractor=extractor,
    )
    # same distribution (uniform noise) vs structured (constant videos)
    near = ev.score_videos(fake_videos(16, seed=4))["fid"]
    constant = np.full((16, 16, 64, 64, 3), 128, np.uint8)
    far = ev.score_videos(constant)["fid"]
    assert near < far


def test_directory_protocol(tmp_path, extractor):
    from dcvgan_tpu.io.video import write_videos_parallel

    gen_dir = tmp_path / "gen"
    ref_dir = tmp_path / "ref"
    gen_dir.mkdir(), ref_dir.mkdir()
    gen = fake_videos(4, seed=5)
    ref = fake_videos(4, seed=6)
    write_videos_parallel(gen, [gen_dir / f"{i}.mp4" for i in range(4)])
    write_videos_parallel(ref, [ref_dir / f"{i}.mp4" for i in range(4)])

    ev = Evaluator(metrics=["is", "fid"], num_samples=4, batchsize=4,
                   extractor=extractor)
    scores = ev.evaluate_dirs(gen_dir, ref_dir)
    assert scores["is"] >= 1.0
    assert np.isfinite(scores["fid"])


def test_synthetic_dataset_generation(tmp_path):
    from dcvgan_tpu.data.dataset import VideoDataset
    from dcvgan_tpu.data.preprocess import get_preprocessor

    ds = VideoDataset(
        name="synthetic",
        dataset_path="unused",
        preprocess_func=get_preprocessor("synthetic"),
        video_length=16,
        image_size=32,
        geometric_info="depth",
        processed_root=tmp_path,
    )
    assert len(ds) == 64
    s = ds.sample(0, np.random.default_rng(0))
    assert s["color"].shape == (16, 32, 32, 3)
    assert s["depth"].shape == (16, 32, 32, 1)
    assert s["color"].min() >= -1 and s["color"].max() <= 1
    # depth is bimodal: near shape / far background
    assert s["depth"].std() > 0.05

    # the same generated tree serves the flow and segmentation branches
    flow_ds = VideoDataset(
        name="synthetic",
        dataset_path="unused",
        preprocess_func=None,
        video_length=16,
        image_size=32,
        geometric_info="optical-flow",
        processed_root=tmp_path,
    )
    f = flow_ds.sample(0, np.random.default_rng(0))
    assert f["optical-flow"].shape == (16, 32, 32, 2)
    # analytic flow: nonzero inside the moving shape, normalized by size
    assert np.abs(f["optical-flow"]).max() > 0
    assert np.abs(f["optical-flow"]).max() <= 8.0 / 32

    segm_ds = VideoDataset(
        name="synthetic",
        dataset_path="unused",
        preprocess_func=None,
        video_length=16,
        image_size=32,
        geometric_info="segmentation",
        processed_root=tmp_path,
    )
    g = segm_ds.sample(0, np.random.default_rng(0))
    assert g["segmentation"].shape == (16, 32, 32, 25)
    # {0,1} one-hot over 25 parts at every pixel, >= 2 classes present
    assert np.allclose(g["segmentation"].sum(-1), 1.0)
    assert set(np.unique(g["segmentation"])) == {0.0, 1.0}
    assert (g["segmentation"].reshape(-1, 25).sum(0) > 0).sum() >= 2


def test_evaluate_cli(tmp_path):
    from dcvgan_tpu.io.video import write_videos_parallel
    from dcvgan_tpu.cli.evaluate import main as eval_main
    import json, io, contextlib

    gen_dir = tmp_path / "gen"
    ref_dir = tmp_path / "ref"
    gen_dir.mkdir(), ref_dir.mkdir()
    write_videos_parallel(fake_videos(3, 7), [gen_dir / f"{i}.mp4" for i in range(3)])
    write_videos_parallel(fake_videos(3, 8), [ref_dir / f"{i}.mp4" for i in range(3)])

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_main([str(gen_dir), "--ref-dir", str(ref_dir),
                   "--metrics", "is", "fvd", "--batchsize", "4"])
    scores = json.loads(buf.getvalue())
    assert set(scores) == {"is", "fvd", "extractor"}
    assert scores["extractor"].startswith("c3d-seeded/seed=")
    assert scores["is"] >= 1.0

    # missing --ref-dir for fid errors out cleanly
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        eval_main([str(gen_dir), "--metrics", "fid"])


def test_real_features_streaming_and_full_set(extractor):
    """max_real_samples <= 0 embeds the full set; streaming in chunks
    matches a one-shot stacked embed (VERDICT r2 #5)."""
    real = fake_videos(10, seed=7)
    ev = Evaluator(metrics=["fid"], num_samples=4, batchsize=4,
                   dataset=ArrayDataset(real), extractor=extractor,
                   max_real_samples=0)
    feats = ev._real_features()
    assert feats.shape[0] == 10
    # reproduce the expected sampling stream and compare chunked vs stacked
    from dcvgan_tpu.utils.video_np import videos_to_uint8

    rng = np.random.default_rng(0)
    idx = rng.choice(10, size=10, replace=False)
    clips = videos_to_uint8(real[idx].astype(np.float32) / 127.5 - 1.0)
    expect, _ = extractor(clips, 4)
    np.testing.assert_allclose(feats, expect, rtol=0, atol=1e-5)
    # positive cap still limits the subset size
    capped = Evaluator(metrics=["fid"], num_samples=4, batchsize=4,
                       dataset=ArrayDataset(real), extractor=extractor,
                       max_real_samples=4)
    assert capped._real_features().shape[0] == 4


def test_extractor_single_compiled_signature(extractor):
    """Every ragged chunk is padded to the jitted batch shape: one compiled
    signature per batchsize regardless of N (VERDICT r2 #6)."""
    before = extractor._embed._cache_size()
    for n in (3, 2, 5, 8):
        f, p = extractor(fake_videos(n, seed=n), 4)
        assert f.shape[0] == n and p.shape[0] == n
    assert extractor._embed._cache_size() - before <= 1


def test_evaluate_dirs_chunked_matches_batch(tmp_path, extractor):
    """Chunked directory embedding must score identically to small-set
    whole-directory reads, and empty dirs fail loudly."""
    from dcvgan_tpu.io.video import write_videos_parallel

    gen_dir = tmp_path / "gen"
    gen_dir.mkdir()
    vids = fake_videos(5, seed=9)  # 5 % batchsize(2) != 0: ragged tail
    write_videos_parallel(vids, [gen_dir / f"{i}.mp4" for i in range(5)])
    ev = Evaluator(metrics=["is"], num_samples=5, batchsize=2,
                   extractor=extractor)
    scores = ev.evaluate_dirs(gen_dir)
    assert scores["is"] >= 1.0
    with pytest.raises(FileNotFoundError):
        ev.evaluate_dirs(tmp_path / "empty")


def test_device_resident_eval_matches_host_path(extractor):
    """Fused sample->embed (videos never leave the device) must score
    identically to the host uint8 round-trip (VERDICT r2 #3): quantization
    is bit-matched, so features agree to float tolerance."""
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import ExperimentConfig
    from dcvgan_tpu.train.step import DCVGAN

    cfg = ExperimentConfig.from_dict({
        "batchsize": 2,
        "geometric_info": {"name": "depth", "channel": 1},
        "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
        "cgen": {"dim_z_color": 4, "ngf": 8},
        "idis": {"ndf": 8}, "vdis": {"ndf": 8}, "gdis": {"ndf": 8},
        "trainer": {"precision": "float32", "donate_state": False},
    })
    gan = DCVGAN(cfg)
    state = gan.init_state(prng.base_key(0))
    real = fake_videos(8, seed=11)
    ev = Evaluator(metrics=["is", "fid"], num_samples=6, batchsize=4,
                   dataset=ArrayDataset(real), extractor=extractor)
    key = prng.base_key(42)
    fused = ev.evaluate(gan, state, key, device_resident=True)
    host = ev.evaluate(gan, state, key, device_resident=False)
    assert fused.keys() == host.keys()
    for k in fused:
        np.testing.assert_allclose(fused[k], host[k], rtol=1e-4, atol=1e-5)


def tiny_gan(batchsize=2):
    from dcvgan_tpu import prng
    from dcvgan_tpu.config import ExperimentConfig
    from dcvgan_tpu.train.step import DCVGAN

    cfg = ExperimentConfig.from_dict({
        "batchsize": batchsize,
        "geometric_info": {"name": "depth", "channel": 1},
        "ggen": {"dim_z_content": 8, "dim_z_motion": 4, "ngf": 8},
        "cgen": {"dim_z_color": 4, "ngf": 8},
        "idis": {"ndf": 8}, "vdis": {"ndf": 8}, "gdis": {"ndf": 8},
        "trainer": {"precision": "float32", "donate_state": False},
    })
    gan = DCVGAN(cfg)
    return gan, gan.init_state(prng.base_key(0))


def test_mesh_sharded_eval_matches_single_device(extractor, devices):
    """Device-resident sample->embed jitted SPMD over the mesh's data axis
    must score the same videos as the unsharded path (state/key replicated,
    partitionable threefry: sharding is a layout choice, not semantics)."""
    from dcvgan_tpu import prng
    from dcvgan_tpu.parallel.mesh import create_mesh, replicate

    gan, state = tiny_gan()
    real = fake_videos(8, seed=13)
    key = prng.base_key(7)

    plain = Evaluator(metrics=["is", "fid"], num_samples=8, batchsize=4,
                      dataset=ArrayDataset(real), extractor=extractor)
    base_feats, base_probs = plain.sample_and_embed(gan, state, key)
    base_scores = plain.evaluate(gan, state, key)

    mesh = create_mesh(data=4, batchsize=4)
    sharded = Evaluator(metrics=["is", "fid"], num_samples=8, batchsize=4,
                        dataset=ArrayDataset(real), extractor=extractor,
                        mesh=mesh)
    rep_state = replicate(state, mesh)
    feats, probs = sharded.sample_and_embed(gan, rep_state, key)
    np.testing.assert_allclose(feats, base_feats, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(probs, base_probs, rtol=1e-4, atol=1e-5)
    scores = sharded.evaluate(gan, rep_state, key)
    for k in base_scores:
        np.testing.assert_allclose(scores[k], base_scores[k],
                                   rtol=1e-4, atol=1e-5)


def test_set_mesh_requires_divisible_batch(extractor, devices):
    from dcvgan_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=4, batchsize=4)
    ev = Evaluator(metrics=["is"], num_samples=6, batchsize=6,
                   extractor=extractor)
    with pytest.raises(ValueError, match="not divisible"):
        ev.set_mesh(mesh)
    assert ev.mesh is None  # rejected mesh must not stick


def test_max_real_samples_config_exposed():
    """evaluation.max_real_samples flows from YAML through build_evaluator
    (VERDICT r2 #5's config-exposure half)."""
    from dcvgan_tpu.cli.train import build_evaluator
    from dcvgan_tpu.config import ExperimentConfig

    cfg = ExperimentConfig.from_dict(
        {"evaluation": {"metrics": ["is"], "max_real_samples": 0}}
    )
    assert cfg.evaluation.max_real_samples == 0
    ev = build_evaluator(cfg, dataset=None)
    assert ev.max_real_samples == 0
    # default stays the cheap in-training subset
    assert ExperimentConfig.from_dict({}).evaluation.max_real_samples == 512


def test_score_features_lazy_real_side():
    """score_features is the single metric-dispatch point: IS-only scoring
    must never touch the real side; fid/prd without one must fail; the
    callable form is invoked at most once."""
    import numpy as np
    import pytest

    from dcvgan_tpu.eval.metrics import score_features

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(16, 8)).astype(np.float32)
    probs = np.full((16, 4), 0.25, np.float32)

    calls = []

    def real():
        calls.append(1)
        return rng.normal(size=(16, 8)).astype(np.float32)

    out = score_features(["is"], feats, probs, real)
    assert set(out) == {"is"} and not calls  # real side untouched

    out = score_features(["is", "fid", "prd"], feats, probs, real)
    assert set(out) == {"is", "fid", "prd", "prd_f1_8"}
    assert len(calls) == 1  # embedded once for both real-side metrics

    with pytest.raises(ValueError):
        score_features(["fid"], feats, probs, None)
    with pytest.raises(KeyError):
        score_features(["nope"], feats, probs, None)
