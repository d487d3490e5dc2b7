"""Every launch script's flag set must parse into a valid Config."""
import glob
import os
import re
import shlex

import pytest

from waldo_tpu.config import parse_cli

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(
    p for p in glob.glob(os.path.join(ROOT, "scripts", "*", "*.sh"))
    if "test_mat" not in p and "demo" not in p  # wrappers delegating to test.sh
)


def extract_args(path):
    text = open(path).read().replace("\\\n", " ")
    m = re.search(r"python -m waldo_tpu\.cli\.(train|test)\s+(.*)", text)
    assert m, path
    args = shlex.split(m.group(2))
    # drop shell var references / pass-through tokens
    out = []
    skip_next = False
    for i, a in enumerate(args):
        if skip_next:
            skip_next = False
            continue
        if a.startswith('"$') or a.startswith("$"):
            continue
        if a.startswith("--") and i + 1 < len(args) and (
            args[i + 1].startswith('"$') or args[i + 1].startswith("$")
        ):
            skip_next = True
            continue
        out.append(a)
    return out


@pytest.mark.parametrize("script", SCRIPTS, ids=[os.path.relpath(s, ROOT) for s in SCRIPTS])
def test_script_flags_parse(script):
    cfg = parse_cli(extract_args(script))
    assert cfg.dim in (128,)
    assert cfg.model.num_obj == 16
    if "kitti" in script:
        assert cfg.aspect_ratio == 3.25
        assert tuple(cfg.model.latent_shape) == (8, 26)
    else:
        assert cfg.aspect_ratio == 2.0
        assert tuple(cfg.model.latent_shape) == (8, 16)
    # module toggles are coherent with the stage
    if "train_lvd" in script:
        assert cfg.vid_modes == ["vid_object_extractor"]
    if "train_flp" in script:
        assert cfg.model.use_pg
    if "train_wif" in script:
        assert cfg.model.use_ii
    if os.path.basename(script) == "test.sh":
        assert cfg.vid_modes == ["vid_prediction"]
        assert cfg.model.restrict_to_ctx


def test_all_six_scripts_per_dataset():
    for ds in ("cityscapes", "kitti"):
        names = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(ROOT, "scripts", ds, "*.sh")))
        assert names == ["demo.sh", "test.sh", "test_mat.sh",
                         "train_flp.sh", "train_lvd.sh", "train_wif.sh"], (ds, names)


def extract_wrapper_extra(path):
    """Flags a test_mat/demo wrapper appends onto its delegate invocation."""
    text = open(path).read().replace("\\\n", " ")
    m = re.search(r'bash "\$\(dirname "\$0"\)/\w+\.sh"\s+(.*)', text)
    assert m, path
    args = [a for a in shlex.split(m.group(1))
            if not (a.startswith('"$') or a.startswith("$"))]
    # drop flags whose value was a shell var (e.g. --data.dataroot "$DEMO_ROOT")
    out, skip = [], False
    raw = shlex.split(m.group(1))
    for i, a in enumerate(raw):
        if skip:
            skip = False
            continue
        if a.startswith("$") or a.startswith('"$'):
            continue
        if a.startswith("--") and i + 1 < len(raw) and raw[i + 1].startswith("$"):
            skip = True
            continue
        out.append(a)
    return out


@pytest.mark.parametrize("ds", ["cityscapes", "kitti"])
def test_mat_wrapper_flags_parse(ds):
    """test_mat.sh + demo.sh delegate chains resolve to a valid MAT config
    (reference scripts/*/test_mat.sh:46-48 flag set)."""
    base = extract_args(os.path.join(ROOT, "scripts", ds, "test.sh"))
    extra = extract_wrapper_extra(os.path.join(ROOT, "scripts", ds, "test_mat.sh"))
    cfg = parse_cli(base + extra)
    m = cfg.model
    assert m.use_inpainter and m.use_mat_inpainter and m.loop_ii
    assert m.inpaint_obj and m.propagate_unique and m.propagate_obj
    assert m.use_shadows and m.use_expansion and m.soft_shadow
    assert m.inpainter_path.endswith(".npz")
    demo_extra = extract_wrapper_extra(os.path.join(ROOT, "scripts", ds, "demo.sh"))
    cfg2 = parse_cli(base + extra + demo_extra)
    assert cfg2.name == f"demo_{ds}"


def test_cont_train_redefaults_from_saved_run(tmp_path):
    """Reference options.py:659-719: continuing a run re-defaults every flag
    from the saved snapshot (same run dir via its datetime), with explicit
    CLI flags still overriding."""
    from waldo_tpu.config import parse_cli, save_config

    cfg = parse_cli(["--name", "runx", "--save_path", str(tmp_path),
                     "--dim", "64", "--s_num_obj", "12", "--dataset", "kitti"])
    save_config(cfg)

    cfg2 = parse_cli(["--cont_train", "--name", "runx",
                      "--save_path", str(tmp_path)])
    assert cfg2.dim == 64
    assert cfg2.model.num_obj == 12
    assert cfg2.data.dataset == "kitti"
    assert cfg2.datetime == cfg.datetime  # continues in the same run dir
    assert cfg2.cont_train

    cfg3 = parse_cli(["--cont_train", "--name", "runx",
                      "--save_path", str(tmp_path), "--dim", "32"])
    assert cfg3.dim == 32 and cfg3.model.num_obj == 12
