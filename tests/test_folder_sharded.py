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
