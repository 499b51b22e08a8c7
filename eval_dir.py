#!/usr/bin/env python
"""Quality-eval CLI: score an output folder (and optional HR folder) with
CLIP-IQA / SMS / PSNR / SSIM / LPIPS using the framework's converted CLIP
towers. Prints one JSON line.

The executable counterpart of the reference's README quality table
(/root/reference/README.md:30-85) and SR_backbone.calc_metrics
(/root/reference/models/SR_model.py:158-169).

  python eval_dir.py --sr_dir outputs/ --hr_dir data/hr/ --ckpt_dir CKPT_PTH
"""

from rsvldm_tpu.eval.quality import main

if __name__ == "__main__":
    main()
