"""train_vlm.py CLI (reference llava/train/train.py entry) smoke tests."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _write_data(path: Path, n=6):
    recs = [{"id": i, "conversations": [
        {"from": "human", "value": f"describe scene {i} in the image"},
        {"from": "gpt", "value": f"a town with {i} harbors and trees"}]}
        for i in range(n)]
    path.write_text(json.dumps(recs))


def test_cli_smoke_trains_and_saves(tmp_path):
    data = tmp_path / "train.json"
    _write_data(data)
    out = subprocess.run(
        [sys.executable, str(REPO / "train_vlm.py"), "--smoke",
         "--data_path", str(data), "--output_dir", str(tmp_path / "out"),
         "--epochs", "12", "--batch_size", "2", "--pad_to", "16",
         "--lr", "5e-2", "--platform", "cpu", "--bits", "8"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["final_loss"] < res["first_loss"] * 0.8, res
    # adapter archive round-trips with its config
    from rsvldm_tpu.training.vlm_trainer import load_lora_npz
    lora, cfg = load_lora_npz(res["adapters"])
    assert cfg.r == 16 and "layer_0" in lora
    assert lora["layer_0"]["q_proj"]["a"].shape[1] == cfg.r
    assert float(np.abs(np.asarray(
        lora["layer_0"]["q_proj"]["b"])).max()) > 0  # training moved B


def test_splice_training_sample_expands_image_span():
    import jax.numpy as jnp
    sys.path.insert(0, str(REPO))
    from train_vlm import splice_training_sample
    from rsvldm_tpu.models.vlm.generate import IMAGE_TOKEN_INDEX
    from rsvldm_tpu.training.vlm_trainer import IGNORE_INDEX

    ids = np.array([5, IMAGE_TOKEN_INDEX, 7, 8], np.int32)
    labels = np.array([IGNORE_INDEX, IGNORE_INDEX, 7, 8], np.int32)
    embed_fn = lambda x: jnp.asarray(np.asarray(x, np.float32)[:, None]
                                     * np.ones((1, 4), np.float32))
    feats = jnp.full((3, 4), 9.0)
    emb, lab = splice_training_sample(ids, labels, embed_fn, feats,
                                      IGNORE_INDEX)
    assert emb.shape == (6, 4) and lab.shape == (6,)
    np.testing.assert_array_equal(np.asarray(emb[1:4]), np.asarray(feats))
    np.testing.assert_array_equal(
        lab, [IGNORE_INDEX] + [IGNORE_INDEX] * 3 + [7, 8])


def _write_image_data(path: Path, n=6):
    recs = [{"id": i, "image": f"img_{i}.png", "conversations": [
        {"from": "human", "value": f"<image>\ndescribe scene {i}"},
        {"from": "gpt", "value": f"a town with {i} harbors"}]}
        for i in range(n)]
    path.write_text(json.dumps(recs))


def test_cli_projector_pretrain(tmp_path):
    """--tune projector = the reference pretrain stage: loss decreases
    with the LM fully frozen; the projector artifact is saved."""
    data = tmp_path / "pre.json"
    _write_image_data(data)
    out = subprocess.run(
        [sys.executable, str(REPO / "train_vlm.py"), "--smoke",
         "--data_path", str(data), "--output_dir", str(tmp_path / "o"),
         "--epochs", "10", "--batch_size", "2", "--pad_to", "16",
         "--lr", "5e-2", "--platform", "cpu", "--tune", "projector",
         "--bits", "16"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["final_loss"] < res["first_loss"]
    assert "adapters" not in res  # projector-only: no LoRA artifact
    from rsvldm_tpu.training.vlm_trainer import load_projector_npz
    proj = load_projector_npz(res["projector"])
    assert "params" in proj


def test_cli_joint_qlora_projector(tmp_path):
    data = tmp_path / "joint.json"
    _write_image_data(data)
    out = subprocess.run(
        [sys.executable, str(REPO / "train_vlm.py"), "--smoke",
         "--data_path", str(data), "--output_dir", str(tmp_path / "o"),
         "--epochs", "10", "--batch_size", "2", "--pad_to", "16",
         "--lr", "5e-2", "--platform", "cpu", "--tune", "lora,projector",
         "--bits", "8"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["final_loss"] < res["first_loss"] * 0.8
    assert "adapters" in res and "projector" in res


def test_cli_dpo(tmp_path):
    """--dpo: preference pairs through the template preprocessors; loss
    starts at exactly log 2 (policy == frozen reference at B=0 init) and
    decreases."""
    data = tmp_path / "dpo.json"
    recs = [{"id": i, "prompt": f"describe scene {i}",
             "chosen": f"a town with {i} harbors", "rejected": "blurry"}
            for i in range(6)]
    data.write_text(json.dumps(recs))
    out = subprocess.run(
        [sys.executable, str(REPO / "train_vlm.py"), "--smoke", "--dpo",
         "--data_path", str(data), "--output_dir", str(tmp_path / "o"),
         "--epochs", "8", "--batch_size", "2", "--pad_to", "16",
         "--lr", "2e-2", "--platform", "cpu", "--bits", "8"],
        capture_output=True, text=True, timeout=900, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert abs(res["first_loss"] - np.log(2)) < 1e-4
    assert res["final_loss"] < res["first_loss"]


def test_preference_dataset_masking():
    from rsvldm_tpu.training.vlm_data import (LazyPreferenceDataset,
                                              Llama3Special)
    import tempfile
    sp = Llama3Special(bos=501, start_header=502, end_header=503, eot=504,
                       nl=505)
    sys.path.insert(0, str(REPO))
    from train_vlm import _hash_encode
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump([{"prompt": "hi there", "chosen": "good answer",
                    "rejected": "bad"}], f)
        path = f.name
    ds = LazyPreferenceDataset(path, _hash_encode, preprocess_kw={"sp": sp})
    it = ds[0]
    from rsvldm_tpu.training.vlm_trainer import IGNORE_INDEX
    for side in ("chosen", "rejected"):
        ids = np.asarray(it[f"{side}_input_ids"])
        labels = np.asarray(it[f"{side}_labels"])
        assert ids.shape == labels.shape
        sup = labels != IGNORE_INDEX
        assert sup.any() and not sup.all()   # answer supervised, prompt not
    # the two sides share the identical prompt prefix
    c, r = (np.asarray(it["chosen_input_ids"]),
            np.asarray(it["rejected_input_ids"]))
    n = min(len(c), len(r))
    shared = np.argmin(c[:n] == r[:n]) or n
    assert shared >= 4
    assert ds.modality_lengths[0] < 0  # text-only record


def test_cli_anyres_lora_with_tiny_captioner(tmp_path, monkeypatch):
    """--image_aspect_ratio anyres: real-checkpoint path with a tiny
    captioner (anyres multi-tile features spliced into LoRA training)."""
    import jax
    from PIL import Image

    sys.path.insert(0, str(REPO / "tests"))
    from test_captioner import (FakeTokenizer, LCFG, VCFG,
                                _tiny_llava_state_dict)
    from safetensors.torch import save_file
    from rsvldm_tpu.models.vlm.captioner import LlavaCaptioner

    d = tmp_path / "ck" / "llava"
    d.mkdir(parents=True)
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))
    real_load = LlavaCaptioner.load.__func__

    def fake_load(cls, ckpt_dir, **kw):
        kw.pop("quant", None)
        return real_load(cls, ckpt_dir, llama_cfg=LCFG, vision_cfg=VCFG,
                         tokenizer=FakeTokenizer(), **kw)

    monkeypatch.setattr(LlavaCaptioner, "load", classmethod(fake_load))
    rng = np.random.default_rng(5)
    (tmp_path / "imgs").mkdir()
    recs = []
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
                        ).save(tmp_path / "imgs" / f"i{i}.png")
        recs.append({"id": i, "image": f"i{i}.png", "conversations": [
            {"from": "human", "value": "<image>\na scene"},
            {"from": "gpt", "value": f"town {i}"}]})
    (tmp_path / "d.json").write_text(json.dumps(recs))

    import train_vlm
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        train_vlm.main([
            "--ckpt_dir", str(tmp_path / "ck"),
            "--data_path", str(tmp_path / "d.json"),
            "--image_folder", str(tmp_path / "imgs"),
            "--output_dir", str(tmp_path / "out"),
            "--image_aspect_ratio", "anyres", "--template", "plain",
            "--bits", "16", "--epochs", "4", "--batch_size", "2",
            "--pad_to", "16", "--lr", "5e-2", "--lora_r", "2"])
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["steps"] == 8 and np.isfinite(res["final_loss"])
    assert res["final_loss"] < res["first_loss"]
