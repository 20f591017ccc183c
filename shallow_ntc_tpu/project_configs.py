"""Project-global configuration (reference: /root/reference/configs.py).

Users point dataset names at file globs here; eval/train configs refer to
datasets by these names. Unlike the reference, `cocotrain` has an explicit
entry (the reference configs used the name without defining it; SURVEY.md
section 2.6).
"""

import os

project_dir = os.environ.get("SHALLOW_NTC_PROJECT_DIR", os.path.abspath("."))
slurm_jobs_dir = os.path.join(project_dir, "slurm_jobs")

_data_root = os.environ.get("SHALLOW_NTC_DATA_DIR", "/data")

dataset_to_globs = dict(
    kodak=os.path.join(_data_root, "kodak", "*.png"),
    kodak_landscape=os.path.join(_data_root, "kodak_landscape", "*.png"),
    tecnick=os.path.join(_data_root, "Tecnick_TESTIMAGES", "RGB", "RGB_OR_1200x1200", "*.png"),
    pval=os.path.join(_data_root, "clic", "pval", "*.png"),
    cocotrain=os.path.join(_data_root, "coco", "train2017", "*.jpg"),
    # Locally generated dead-leaves corpus (scripts/make_deadleaves_dataset.py)
    # -- the in-environment stand-in for photographic train/eval data.
    deadleaves_train=os.path.join(project_dir, "data", "deadleaves", "train", "*.png"),
    deadleaves_valid=os.path.join(project_dir, "data", "deadleaves", "valid", "*.png"),
    deadleaves_eval=os.path.join(project_dir, "data", "deadleaves", "eval", "*.png"),
)

# Abbreviations used when building runnames from config keys
# (reference configs.py: args_abbr; consumed by utils/runname.py).
args_abbr = {
    "rd_lambda": "lmbda",
    "bottleneck_size": "csize",
    "hidden_channels": "hc",
    "uq_method": "uq",
}
