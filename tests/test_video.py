"""Video modality: container decode (process_video, the decord path on
OpenCV) and the LLaVA-Video feature stream (get_2dPool + newline
placement), with inline torch oracles mirroring the cited reference lines
(llava_arch.py:173-251 — the reference llava package itself is stubbed by
ref_oracle, so the oracle math is restated verbatim in torch here).
"""

import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rsvldm_tpu.models.vlm.video import (add_token_per_frame,  # noqa: E402
                                         add_token_per_grid, pool_2d,
                                         process_video,
                                         video_feature_stream)


def _write_video(path, n_frames=24, fps=6, size=32):
    """Solid-color frames: frame i is (i*10, 0, 0) RGB, recoverable after
    lossy codecs."""
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(str(path), fourcc, fps, (size, size))
    if not w.isOpened():  # codec fallback: MJPG avi is built in everywhere
        path = path.with_suffix(".avi")
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"),
                            fps, (size, size))
        assert w.isOpened()
    for i in range(n_frames):
        frame = np.zeros((size, size, 3), np.uint8)
        frame[..., 2] = min(i * 10, 255)  # BGR: red plane
        w.write(frame)
    w.release()
    return path


def test_process_video_sampling_arithmetic(tmp_path):
    """fps=6 at video_fps=1 -> step 6 -> indices 0,6,12,18; frame_time is
    idx/step (the reference's utils.py:32 quirk)."""
    p = _write_video(tmp_path / "v.mp4", n_frames=24, fps=6)
    video, video_time, frame_time, num = process_video(str(p), video_fps=1)
    assert num == 4 and video.shape == (4, 32, 32, 3)
    assert video_time == pytest.approx(4.0)
    assert frame_time == "0.00s,1.00s,2.00s,3.00s"
    # sampled content: red ramp at the sampled indices (codec-lossy)
    reds = video[:, 16, 16, 0].astype(int)
    assert np.allclose(reds, [0, 60, 120, 180], atol=12), reds


def test_process_video_upbound_resample(tmp_path):
    """frames_upbound triggers the uniform linspace resample with
    frame_time in true seconds (utils.py:35-39)."""
    p = _write_video(tmp_path / "v.mp4", n_frames=24, fps=6)
    video, _, frame_time, num = process_video(str(p), video_fps=6,
                                              frames_upbound=3,
                                              force_sample=True)
    idx = np.linspace(0, 23, 3, dtype=int)
    assert num == 3 and video.shape[0] == 3
    assert frame_time == ",".join(f"{i / 6:.2f}s" for i in idx)
    reds = video[:, 16, 16, 0].astype(int)
    assert np.allclose(reds, idx * 10, atol=12), reds


def test_process_video_missing_file(tmp_path):
    with pytest.raises((FileNotFoundError, ValueError)):
        process_video(str(tmp_path / "nope.mp4"))


def test_process_video_sparse_seek_path(tmp_path):
    """Sparse sampling (total >> wanted) goes through per-index seeks, not
    a full sequential decode — content must still match the indices."""
    p = _write_video(tmp_path / "long.mp4", n_frames=200, fps=10, size=24)
    video, _, _, num = process_video(str(p), video_fps=10,
                                     frames_upbound=5, force_sample=True)
    idx = np.linspace(0, 199, 5, dtype=int)
    assert num == 5
    reds = video[:, 12, 12, 0].astype(int)
    assert np.allclose(reds, np.minimum(idx * 10, 255), atol=14), (reds, idx)


def test_clip_preprocess_frame_shortest_edge_center_crop():
    """CLIP processor transform (not a square squash): 40x30 at size 28 ->
    resize shortest edge (37x28), center crop 28x28."""
    from PIL import Image

    from rsvldm_tpu.models.vlm.video import clip_preprocess_frame
    img = Image.new("RGB", (40, 30))
    arr = np.zeros((30, 40, 3), np.uint8)
    arr[:, :, 0] = np.arange(40)[None, :] * 6  # horizontal ramp
    img = Image.fromarray(arr)
    out = clip_preprocess_frame(img, 28)
    assert out.shape == (28, 28, 3) and out.dtype == np.float32
    ref = img.resize((37, 28), Image.BICUBIC).crop((4, 0, 32, 28))
    np.testing.assert_allclose(out, np.asarray(ref, np.float32) / 255.0)


# ---------------------------------------------------------------- features

def _torch_pool(feats, stride, mode, h):
    """llava_arch.py:173-193 verbatim in torch."""
    t, p, d = feats.shape
    x = torch.from_numpy(feats).view(t, h, h, d).permute(0, 3, 1, 2)
    if mode == "average":
        x = torch.nn.functional.avg_pool2d(x, stride)
    elif mode == "max":
        x = torch.nn.functional.max_pool2d(x, stride)
    else:
        import math
        scaled = [math.ceil(h / stride), math.ceil(h / stride)]
        x = torch.nn.functional.interpolate(x, size=scaled, mode="bilinear")
    return x.permute(0, 2, 3, 1).reshape(t, -1, d).numpy()


@pytest.mark.parametrize("mode", ["average", "max", "bilinear"])
@pytest.mark.parametrize("h,stride", [(6, 2), (5, 2), (7, 3)])
def test_pool_2d_torch_parity(mode, h, stride):
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((3, h * h, 5)).astype(np.float32)
    ours = np.asarray(pool_2d(jnp.asarray(feats), stride, mode))
    ref = _torch_pool(feats, stride, mode, h)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_newline_placement_torch_parity():
    """add_token_per_grid/per_frame vs the reference's view/permute dance
    (llava_arch.py:224-251 verbatim in torch)."""
    rng = np.random.default_rng(1)
    t, h, d = 3, 4, 6
    feats = rng.standard_normal((t, h * h, d)).astype(np.float32)
    nl = rng.standard_normal((d,)).astype(np.float32)

    x = torch.from_numpy(feats).view(t, 1, h, h, d)
    x = x.permute(4, 0, 2, 1, 3).contiguous()
    x = x.flatten(1, 2).flatten(2, 3)
    x = torch.cat((x, torch.from_numpy(nl)[:, None, None].expand(
        *x.shape[:-1], 1)), dim=-1)
    ref_grid = x.flatten(1, 2).transpose(0, 1).numpy()
    ours_grid = np.asarray(add_token_per_grid(jnp.asarray(feats),
                                              jnp.asarray(nl)))
    np.testing.assert_allclose(ours_grid, ref_grid, atol=0)

    y = torch.from_numpy(feats).permute(2, 0, 1).contiguous()
    y = torch.cat((y, torch.from_numpy(nl)[:, None, None].expand(
        *y.shape[:-1], 1)), dim=-1)
    ref_frame = y.permute(1, 2, 0).contiguous().numpy()
    ours_frame = np.asarray(add_token_per_frame(jnp.asarray(feats),
                                                jnp.asarray(nl)))
    np.testing.assert_allclose(ours_frame, ref_frame, atol=0)


def test_video_feature_stream_modes():
    rng = np.random.default_rng(2)
    t, h, d = 2, 4, 6
    feats = jnp.asarray(rng.standard_normal((t, h * h, d)).astype(np.float32))
    nl = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
    pooled_h = 2  # ceil(4/2)
    grid = video_feature_stream(feats, nl, 2, "bilinear", "grid")
    assert grid.shape == (t * pooled_h * (pooled_h + 1), d)
    frame = video_feature_stream(feats, nl, 2, "bilinear", "frame")
    assert frame.shape == (t * (pooled_h * pooled_h + 1), d)
    one = video_feature_stream(feats, nl, 2, "bilinear", "one_token",
                               patch_merge_type="spatial_unpad")
    assert one.shape == (t * pooled_h * pooled_h + 1, d)
    assert np.allclose(np.asarray(one[-1]), np.asarray(nl))
    none = video_feature_stream(feats, nl, 2, "bilinear", "no_token")
    assert none.shape == (t * pooled_h * pooled_h, d)
    raw = video_feature_stream(feats, nl, 0, "bilinear", "no_token")
    assert raw.shape == (t * h * h, d)
    with pytest.raises(ValueError):
        video_feature_stream(feats, nl, 2, "bilinear", "bogus")


# ----------------------------------------------------------------- dataset

def test_dataset_video_branch(tmp_path):
    """A 'video' record decodes the container, prepends the verbatim time
    instruction (train.py:1199-1201), and ships PIL frames under
    item['video']; the <image> token survives normalize_multimodal."""
    from rsvldm_tpu.training.vlm_data import (IMAGE_TOKEN_INDEX,
                                              LazyConversationDataset)
    p = _write_video(tmp_path / "clip.mp4", n_frames=12, fps=6)
    rec = [{"id": "v0", "video": p.name,
            "conversations": [
                {"from": "human", "value": "<image>\nWhat happens?"},
                {"from": "gpt", "value": "A red ramp."}]}]
    data = tmp_path / "data.json"
    data.write_text(json.dumps(rec))

    def encode(s):
        return [(ord(c) % 96) + 2 for c in s]

    from rsvldm_tpu.training.vlm_data import Llama3Special
    sp = Llama3Special(bos=501, start_header=502, end_header=503, eot=504,
                       nl=505)
    ds = LazyConversationDataset(
        str(data), encode, template="llama_3",
        video_folder=str(tmp_path), video_fps=1, frames_upbound=2,
        force_sample=True, add_time_instruction=True,
        preprocess_kw={"sp": sp})
    item = ds[0]
    assert "video" in item and len(item["video"]) == 2
    assert item["video"][0].size == (32, 32)  # PIL frames
    assert (np.asarray(item["input_ids"]) == IMAGE_TOKEN_INDEX).sum() == 1
    # time instruction entered the tokenized stream: the human turn is
    # longer than the raw prompt alone
    assert len(item["input_ids"]) > len(encode("<image>\nWhat happens?")) + 10

    # frame-preprocessor hook
    ds2 = LazyConversationDataset(
        str(data), encode, template="llama_3",
        video_folder=str(tmp_path), video_fps=1,
        process_frame=lambda f: np.asarray(f), preprocess_kw={"sp": sp})
    item2 = ds2[0]
    assert isinstance(item2["video"][0], np.ndarray)

    # collate passes videos through
    from rsvldm_tpu.training.vlm_data import collate
    batch = collate([item, {"input_ids": [1, 2], "labels": [1, 2]}],
                    pad_id=0)
    assert batch["videos"][0] is not None and batch["videos"][1] is None


def test_dataset_image_precedence_and_force_sample_guard(tmp_path):
    """'image' wins over 'video' (train.py if/elif) — a bogus video next
    to a real image must never be decoded; force_sample without
    frames_upbound fails loudly."""
    from PIL import Image

    from rsvldm_tpu.training.vlm_data import (LazyConversationDataset,
                                              Llama3Special)
    img = tmp_path / "a.png"
    Image.new("RGB", (8, 8), (1, 2, 3)).save(img)
    rec = [{"id": "b0", "image": "a.png", "video": "does-not-exist.mp4",
            "conversations": [
                {"from": "human", "value": "<image>\nWhat?"},
                {"from": "gpt", "value": "A square."}]}]
    data = tmp_path / "d.json"
    data.write_text(json.dumps(rec))
    sp = Llama3Special(bos=501, start_header=502, end_header=503, eot=504,
                       nl=505)
    enc = lambda s: [(ord(c) % 96) + 2 for c in s]
    ds = LazyConversationDataset(
        str(data), enc, template="llama_3", image_folder=str(tmp_path),
        video_folder=str(tmp_path),
        process_image=lambda p: np.asarray(Image.open(p)),
        preprocess_kw={"sp": sp})
    item = ds[0]  # must NOT try to decode the bogus video
    assert "image" in item and "video" not in item

    # frame-folder force_sample with frames_upbound=0 -> loud error
    fdir = tmp_path / "shareVideoGPTV_x"
    fdir.mkdir()
    Image.new("RGB", (8, 8)).save(fdir / "0001.png")
    rec2 = [{"id": "v1", "video": fdir.name,
             "conversations": [
                 {"from": "human", "value": "<image>\nWhat?"},
                 {"from": "gpt", "value": "x"}]}]
    data2 = tmp_path / "d2.json"
    data2.write_text(json.dumps(rec2))
    ds2 = LazyConversationDataset(
        str(data2), enc, template="llama_3", video_folder=str(tmp_path),
        force_sample=True, frames_upbound=0, preprocess_kw={"sp": sp})
    with pytest.raises(ValueError, match="frames_upbound"):
        ds2[0]


def test_to_unit_pixels_scale():
    """normalize_pixels expects [0,1]; the train CLI's pixel prep must
    scale uint8 down (regression: raw 0-255 went straight in)."""
    import train_vlm
    out = np.asarray(train_vlm.to_unit_pixels(
        np.full((2, 2, 3), 255, np.uint8)))
    assert out.max() == pytest.approx(1.0) and out.dtype == np.float32


def test_captioner_video_features_tiny():
    """Tiny tower+projector: video_features returns the pooled grid
    stream at the documented shape."""
    import dataclasses

    from rsvldm_tpu.models.vlm.captioner import LlavaCaptioner
    from rsvldm_tpu.models.vlm.llama import LlamaConfig, LlamaModel
    from rsvldm_tpu.models.vlm.projector import MLPProjector
    from rsvldm_tpu.models.vlm.vision import (CLIP_VIT_L_336_CONFIG,
                                              CLIPVisionTower)
    from PIL import Image

    vcfg = dataclasses.replace(CLIP_VIT_L_336_CONFIG, image_size=28,
                               patch_size=7, width=16, layers=1, heads=2)
    vision = CLIPVisionTower(vcfg)
    vparams = vision.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 28, 28, 3)))
    lcfg = LlamaConfig(vocab_size=64, dim=12, layers=1, heads=2, kv_heads=1,
                       ffn_dim=24, dtype=jnp.float32)
    llama = LlamaModel(lcfg)
    # tower tokens = (28/7)^2 = 16
    proj = MLPProjector(out_dim=lcfg.dim, dtype=jnp.float32)
    pparams = proj.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16)))
    cap = LlavaCaptioner.__new__(LlavaCaptioner)
    cap.vision, cap.vision_params = vision, vparams
    cap.projector, cap.projector_params = proj, pparams
    cap.image_newline = jnp.zeros((lcfg.dim,), jnp.float32)
    frames = [Image.new("RGB", (40, 30), (i * 40, 10, 10)) for i in range(3)]
    out = cap.video_features(frames)          # stride 2: 4x4 -> 2x2 grid
    assert out.shape == (3 * 2 * (2 + 1), lcfg.dim)
    out2 = cap.video_features(frames, newline_position="one_token")
    assert out2.shape == (3 * 4 + 1, lcfg.dim)
