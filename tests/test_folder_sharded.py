"""Multi-chip sharded folder inference (BASELINE config 5) on the CPU mesh."""

import numpy as np
import pytest
from PIL import Image

from rsvldm_tpu.config import PipelineConfig, Stage1Config
from rsvldm_tpu.parallel import make_mesh
from rsvldm_tpu.pipeline import ImageBatchProcessor, SuperResolutionPipeline


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("folder")
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
                        ).save(d / f"im{i}.png")
    # one differently-sized image to exercise shape grouping
    Image.fromarray(rng.integers(0, 255, (30, 20, 3), dtype=np.uint8)
                    ).save(d / "odd.png")
    return d


def test_stage1_batch_sharded(image_dir, tmp_path):
    cfg = PipelineConfig(output_dir=str(tmp_path), ckpt_dir=str(tmp_path / "x"),
                         no_llava=True)
    cfg.stage1 = Stage1Config(steps=2)
    pipe = SuperResolutionPipeline(cfg, debug_tiny=True)
    mesh = make_mesh(8, tile=1)
    paths = sorted(image_dir.iterdir())
    outs = pipe.run_stage1_batch(paths, mesh=mesh)
    assert len(outs) == len(paths)
    for o in outs:
        assert o.dtype == np.uint8
        assert o.shape == (16, 16, 3)


def test_batch_processor_sharded(image_dir, tmp_path):
    cfg = PipelineConfig(image_dir=str(image_dir),
                         output_dir=str(tmp_path / "out"),
                         ckpt_dir=str(tmp_path / "x"),
                         no_llava=True, stage1_only=True)
    cfg.stage1 = Stage1Config(steps=2)
    mesh = make_mesh(8, tile=1)
    proc = ImageBatchProcessor(cfg, debug_tiny=True, mesh=mesh)
    results = proc.run(batch_stage1=True)
    assert len(results) == 6
    assert all(s == "stage1" for _, s in results)
    out = tmp_path / "out" / "sr3_output"
    assert len(list(out.iterdir())) == 6


def test_batch_processor_with_tiny_captioner(image_dir, tmp_path):
    """Folder run where Stage-2a goes through the BATCHED caption path
    (captions precomputed in chunks between stage 1 and refinement)."""
    import sys
    sys.path.insert(0, "tests")
    import test_captioner as tc
    from safetensors.torch import save_file

    ckpt = tmp_path / "ckpt"
    (ckpt / "llava").mkdir(parents=True)
    save_file(tc._tiny_llava_state_dict(),
              str(ckpt / "llava" / "model.safetensors"))

    cfg = PipelineConfig(image_dir=str(image_dir),
                         output_dir=str(tmp_path / "out"),
                         ckpt_dir=str(ckpt))
    cfg.stage1 = Stage1Config(steps=2)
    cfg.refine.edm_steps = 2
    cfg.llava.max_new_tokens = 4
    cfg.llava.temperature = 0.0
    cfg.llava.do_sample = False
    proc = ImageBatchProcessor(
        cfg, debug_tiny=True, caption_batch=4,
        llava_load_kw=dict(llama_cfg=tc.LCFG, vision_cfg=tc.VCFG,
                           tokenizer=tc.FakeTokenizer()))
    results = proc.run(batch_stage1=True)
    assert len(results) == 6
    assert all(s == "ok" for _, s in results)
    assert proc.pipe.llava is not None
    finals = list((tmp_path / "out" / "output").iterdir())
    assert len(finals) == 6
