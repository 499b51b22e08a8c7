"""Round-2 gap closers: pooler projector, expand2square, S2 multiscale,
lmdb backend, URL fetch, delta/merge tools."""

import importlib.util
import sys
import types

import numpy as np
import pytest
from PIL import Image

import ref_oracle

if ref_oracle.available():
    ref_oracle.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rsvldm_tpu.models.vlm.anyres import expand2square  # noqa: E402
from rsvldm_tpu.models.vlm.projector import (MLPProjector,  # noqa: E402
                                             PoolerProjector, build_projector)
from rsvldm_tpu.models.vlm.vision import s2_multiscale_features  # noqa: E402
from rsvldm_tpu.data.datasets import LmdbLRHRDataset  # noqa: E402
from rsvldm_tpu.utils.file import (apply_delta, consolidate,  # noqa: E402
                                   list_files, load_file_from_url, make_delta)


def _load_ref(rel, name):
    spec = importlib.util.spec_from_file_location(name,
                                                  f"/root/reference/{rel}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not ref_oracle.available(), reason="no reference")
def test_pooler_projector_parity():
    torch = pytest.importorskip("torch")
    from rsvldm_tpu.utils.convert_hf import convert_pooler_projector
    RefPooler = _load_ref(
        "llava/model/multimodal_projector/pooler_projector.py",
        "ref_pooler").PoolerProjector
    cfg = types.SimpleNamespace(mm_hidden_size=24, hidden_size=32)
    vcfg = types.SimpleNamespace(image_size=56, patch_size=14)  # hw=4
    torch.manual_seed(0)
    ref = RefPooler(cfg, vcfg).eval()
    for p in ref.parameters():
        p.data.normal_(0, 0.05)
    x = np.random.default_rng(0).normal(size=(2, 16, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    sd = {f"model.mm_projector.{k}": v for k, v in ref.state_dict().items()}
    params = convert_pooler_projector(sd)
    got = PoolerProjector(out_dim=32, hw=4).apply(params, jnp.asarray(x))
    assert got.shape == want.shape == (2, 4, 32)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-4)


def test_build_projector_dispatch():
    assert isinstance(build_projector("mlp2x_gelu"), MLPProjector)
    assert build_projector("mlp3x_gelu").depth == 3
    assert build_projector("linear").depth == 1
    assert isinstance(build_projector("pooler", hw=4), PoolerProjector)
    assert build_projector("identity")(5) == 5
    with pytest.raises(ValueError):
        build_projector("nope")


def test_expand2square_matches_reference():
    img = Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (30, 50, 3), dtype=np.uint8))
    out = expand2square(img, (7, 8, 9))
    assert out.size == (50, 50)
    arr = np.asarray(out)
    np.testing.assert_array_equal(arr[10:40], np.asarray(img))
    np.testing.assert_array_equal(arr[0], np.broadcast_to([7, 8, 9], (50, 3)))
    # tall image pads horizontally; square is a no-op (same object)
    tall = Image.fromarray(np.zeros((50, 30, 3), np.uint8))
    assert expand2square(tall, (0, 0, 0)).size == (50, 50)
    sq = Image.fromarray(np.zeros((20, 20, 3), np.uint8))
    assert expand2square(sq, (0, 0, 0)) is sq


def test_s2_multiscale_features():
    """Channel layout + pooling contract: constant images must produce
    per-scale features equal to the single-scale forward."""
    c_out = 6

    def vision_apply(tiles):
        # mean-pool patches: [N, 16, 16, 3] with patch 8 -> [N, 4, c]
        n = tiles.shape[0]
        g = tiles.reshape(n, 2, 8, 2, 8, 3).mean(axis=(2, 4))
        g = g.reshape(n, 4, 3)
        return jnp.concatenate([g, g], axis=-1)  # c=6

    imgs = jnp.ones((2, 16, 16, 3)) * 0.5
    out = s2_multiscale_features(vision_apply, imgs, scales=(16, 32),
                                 patch_size=8)
    assert out.shape == (2, 4, 2 * c_out)
    base = vision_apply(imgs)
    np.testing.assert_allclose(np.asarray(out[..., :c_out]),
                               np.asarray(base), atol=1e-6)
    # constant input -> high-res scale pools back to the same values
    np.testing.assert_allclose(np.asarray(out[..., c_out:]),
                               np.asarray(base), atol=1e-5)


class _FakeTxn:
    def __init__(self, d):
        self.d = d

    def get(self, k):
        return self.d.get(k)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    def __init__(self, d):
        self.d = d

    def begin(self, *a, **k):
        return _FakeTxn(self.d)


def _png_bytes(rng, size):
    import io
    img = Image.fromarray(rng.integers(0, 255, (size, size, 3),
                                       dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_lmdb_dataset_fake_env():
    rng = np.random.default_rng(0)
    d = {b"length": b"3"}
    for i in range(3):
        d[f"hr_16_{str(i).zfill(5)}".encode()] = _png_bytes(rng, 16)
        d[f"sr_8_16_{str(i).zfill(5)}".encode()] = _png_bytes(rng, 16)
        d[f"lr_8_{str(i).zfill(5)}".encode()] = _png_bytes(rng, 8)
    ds = LmdbLRHRDataset(_FakeEnv(d), l_res=8, r_res=16, split="val",
                         need_lr=True)
    assert len(ds) == 3
    hr, sr, lr = ds[1]
    assert hr.shape == (16, 16, 3) and lr.shape == (8, 8, 3)
    assert hr.min() >= -1 and hr.max() <= 1
    with pytest.raises(KeyError):
        ds[7]
    ds2 = LmdbLRHRDataset(_FakeEnv(d), l_res=8, r_res=16, data_len=2)
    assert len(ds2) == 2


def test_lmdb_path_requires_library(tmp_path):
    try:
        import lmdb  # noqa: F401
        pytest.skip("lmdb installed — path backend usable")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        LmdbLRHRDataset(str(tmp_path), l_res=8, r_res=16)


def test_load_file_from_url_cache(tmp_path):
    src = tmp_path / "weights.bin"
    src.write_bytes(b"abc123")
    url = src.as_uri()
    out = load_file_from_url(url, model_dir=str(tmp_path / "cache"))
    assert open(out, "rb").read() == b"abc123"
    src.write_bytes(b"CHANGED")  # cached: second call must NOT re-download
    out2 = load_file_from_url(url, model_dir=str(tmp_path / "cache"))
    assert out2 == out and open(out2, "rb").read() == b"abc123"
    named = load_file_from_url(url, model_dir=str(tmp_path / "cache"),
                               file_name="renamed.bin")
    assert named.endswith("renamed.bin")


def test_list_files(tmp_path):
    (tmp_path / "a.png").write_bytes(b"x")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.jpg").write_bytes(b"x")
    (tmp_path / "c.txt").write_bytes(b"x")
    out = list_files(tmp_path)
    assert len(out) == 2
    assert list_files(tmp_path, recursive=False) == [str(tmp_path / "a.png")]


def test_delta_roundtrip():
    rng = np.random.default_rng(0)
    base = {"model.embed_tokens.weight": rng.normal(size=(10, 4)),
            "model.layers.0.w": rng.normal(size=(4, 4)),
            "lm_head.weight": rng.normal(size=(10, 4))}
    target = {"model.embed_tokens.weight": rng.normal(size=(12, 4)),  # +2 vocab
              "model.layers.0.w": rng.normal(size=(4, 4)),
              "lm_head.weight": rng.normal(size=(12, 4)),
              "model.mm_projector.weight": rng.normal(size=(4, 4))}
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    for k in target:
        np.testing.assert_allclose(back[k], np.asarray(target[k], np.float32),
                                   atol=1e-5)
    with pytest.raises(AssertionError):
        apply_delta(base, {"model.layers.0.w": np.zeros((3, 3))})


def test_consolidate():
    sd = {"base_model.model.model.layers.0.w": 1, "other": 2}
    out = consolidate(sd)
    assert out == {"model.layers.0.w": 1, "other": 2}


def test_sample_video_frames(tmp_path):
    from rsvldm_tpu.models.vlm.video import (sample_video_frames,
                                             time_instruction)
    rng = np.random.default_rng(0)
    for i in range(20):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                        ).save(tmp_path / f"f{i:03d}.png")
    frames, vt, ft = sample_video_frames(tmp_path, num_frames=5)
    assert len(frames) == 5
    assert vt == 10.0  # 20 frames / 2 fps
    assert ft.startswith("0.00s,") and ft.endswith("9.50s")
    txt = time_instruction(vt, 5, ft)
    assert "lasts for 10.00 seconds" in txt and "5 frames" in txt
    with pytest.raises(FileNotFoundError):
        sample_video_frames(tmp_path / "empty")
