"""End-to-end pipeline smoke test (tiny models, CPU, random weights)."""

import logging

import numpy as np
import pytest
from PIL import Image

from rsvldm_tpu.config import PipelineConfig, Stage1Config
from rsvldm_tpu.pipeline import SuperResolutionPipeline, ImageBatchProcessor


@pytest.fixture(scope="module")
def sample_image(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (28, 28, 3), dtype=np.uint8))
    p = d / "test.png"
    img.save(p)
    return p


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    out = tmp_path_factory.mktemp("out")
    cfg = PipelineConfig(output_dir=str(out), ckpt_dir=str(out / "nockpt"),
                         no_llava=True)
    cfg.stage1 = Stage1Config(steps=3)
    cfg.refine.edm_steps = 3
    cfg.refine.min_size = 64
    return SuperResolutionPipeline(cfg, debug_tiny=True)


def test_full_pipeline_runs(pipeline, sample_image):
    final = pipeline.process(str(sample_image))
    assert final.size[0] > 0
    out_dir = pipeline.cfg.output_dir
    assert (out_dir / "sr3_test.png").exists()
    assert (out_dir / "test_final_0.png").exists()


def test_stage1_output_shape(pipeline, sample_image):
    sr = pipeline.run_stage1(str(sample_image))
    assert sr.dtype == np.uint8
    assert sr.shape == (16, 16, 3)  # tiny SR3 image_size


def test_batch_processor(tmp_path, sample_image):
    cfg = PipelineConfig(image_dir=str(sample_image.parent),
                         output_dir=str(tmp_path / "batch"),
                         ckpt_dir=str(tmp_path / "nockpt"),
                         no_llava=True, stage1_only=True)
    cfg.stage1 = Stage1Config(steps=2)
    proc = ImageBatchProcessor(cfg, debug_tiny=True)
    results = proc.run()
    assert len(results) == 1
    assert results[0][1] == "stage1"
    assert (tmp_path / "batch" / "sr3_output" / "sr3_test.png").exists()


def test_pipeline_tile_vae_path(tmp_path, sample_image):
    """use_tile_vae engages the tiled encode/decode (tiny: tile < image)."""
    cfg = PipelineConfig(output_dir=str(tmp_path / "tv"),
                         ckpt_dir=str(tmp_path / "nock"), no_llava=True)
    cfg.stage1 = Stage1Config(steps=2)
    cfg.refine.edm_steps = 2
    cfg.refine.min_size = 64
    cfg.refine.use_tile_vae = True
    cfg.refine.encoder_tile_size = 32
    cfg.refine.decoder_tile_size = 8
    pipe = SuperResolutionPipeline(cfg, debug_tiny=True)
    final = pipe.process(str(sample_image))
    assert final.size[0] > 0


def test_num_samples(tmp_path, sample_image):
    cfg = PipelineConfig(output_dir=str(tmp_path / "ns"),
                         ckpt_dir=str(tmp_path / "nock2"), no_llava=True)
    cfg.stage1 = Stage1Config(steps=2)
    cfg.refine.edm_steps = 2
    cfg.refine.min_size = 64
    cfg.refine.num_samples = 2
    pipe = SuperResolutionPipeline(cfg, debug_tiny=True)
    out = pipe.process(str(sample_image))
    assert (tmp_path / "ns" / "test_final_0.png").exists()
    assert (tmp_path / "ns" / "test_final_1.png").exists()


def test_stage1_ddim_sampler(tmp_path):
    from rsvldm_tpu.config import PipelineConfig, Stage1Config
    from rsvldm_tpu.pipeline import SuperResolutionPipeline
    from PIL import Image
    import numpy as np
    img = tmp_path / "x.png"
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (24, 24, 3), dtype=np.uint8)).save(img)
    cfg = PipelineConfig(output_dir=str(tmp_path), ckpt_dir=str(tmp_path),
                         no_llava=True, stage1_only=True)
    cfg.stage1 = Stage1Config(steps=16, sampler="ddim", ddim_steps=4)
    pipe = SuperResolutionPipeline(cfg, debug_tiny=True)
    out = pipe.run_stage1(str(img))
    assert out.shape == (16, 16, 3) and out.dtype == np.uint8


def test_full_three_stage_with_tiny_captioner(tmp_path):
    """End-to-end process() with the REAL caption stage at tiny scale: the
    caption text flows into the refinement conditioning (previously the
    caption stage was only testable outside the pipeline)."""
    import sys
    sys.path.insert(0, "tests")
    import test_captioner as tc
    from safetensors.torch import save_file
    from PIL import Image
    from rsvldm_tpu.config import PipelineConfig, Stage1Config
    from rsvldm_tpu.pipeline import SuperResolutionPipeline
    import numpy as np

    ckpt = tmp_path / "ckpt"
    (ckpt / "llava").mkdir(parents=True)
    save_file(tc._tiny_llava_state_dict(),
              str(ckpt / "llava" / "model.safetensors"))
    img = tmp_path / "x.png"
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (24, 24, 3), dtype=np.uint8)).save(img)

    cfg = PipelineConfig(input_img=str(img), output_dir=str(tmp_path / "o"),
                         ckpt_dir=str(ckpt))
    cfg.stage1 = Stage1Config(steps=2)
    cfg.refine.edm_steps = 2
    cfg.llava.max_new_tokens = 4
    cfg.llava.temperature = 0.0
    cfg.llava.do_sample = False
    pipe = SuperResolutionPipeline(
        cfg, debug_tiny=True,
        llava_load_kw=dict(llama_cfg=tc.LCFG, vision_cfg=tc.VCFG,
                           tokenizer=tc.FakeTokenizer()))
    out = pipe.process()
    assert out.size == (16, 16)  # debug_tiny stage-1 output size
    assert pipe.llava is not None  # caption stage actually ran
    assert (tmp_path / "o" / "x_final_0.png").exists()


def test_batch_processor_saves_all_samples(tmp_path, sample_image,
                                           monkeypatch):
    """refine.num_samples > 1: the folder driver must save one
    _final_{i}.png per sample (run_refinement returns a LIST then)."""
    cfg = PipelineConfig(image_dir=str(sample_image.parent),
                         output_dir=str(tmp_path / "ns"),
                         ckpt_dir=str(tmp_path / "nockpt"), no_llava=True)
    cfg.stage1 = Stage1Config(steps=2)
    cfg.refine.edm_steps = 2
    cfg.refine.min_size = 64
    cfg.refine.num_samples = 2
    proc = ImageBatchProcessor(cfg, debug_tiny=True)
    # surgical: the save path is under test, not the sampler — return two
    # distinguishable PILs from the refinement
    pils = [Image.fromarray(np.full((8, 8, 3), v, np.uint8))
            for v in (10, 200)]
    monkeypatch.setattr(proc.pipe, "run_refinement",
                        lambda s, c, **kw: pils)
    results = proc.run()
    assert results[0][1] == "ok"
    final_dir = tmp_path / "ns" / "output"
    assert (final_dir / "test_final_0.png").exists()
    assert (final_dir / "test_final_1.png").exists()
