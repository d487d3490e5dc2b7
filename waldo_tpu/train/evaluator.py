"""Inference/eval loop (re-design of reference helpers/synthesizer_evaluator.py:35-77).

Runs `vid_prediction` over the eval split, dumps real/rec/pred/inp_pred
videos as mp4 under results/<signature>/ (reference synthesizer.py:403-411)
and aggregates scalar metrics.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..data import create_dataset, DataLoader
from ..models import Synthesizer
from ..parallel import make_mesh, shard_batch, replicate, init_distributed
from .checkpoint import CheckpointManager, normalize_which


def save_video_frames(vid: np.ndarray, path: str, fps: int = 4):
    """vid (T, H, W, 3) in [-1,1] -> mp4 (imageio when present), else MJPG
    .avi via the framework's own RIFF writer (data/video.py), else PNGs."""
    arr = ((np.clip(vid, -1, 1) + 1) / 2 * 255).astype(np.uint8)
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, list(arr), fps=fps, macro_block_size=1)
        return
    except Exception:
        pass
    try:
        from ..data.video import write_mjpeg_avi

        write_mjpeg_avi(path[:-4] + ".avi", arr, fps=fps)
        return
    except Exception:
        # last resort: frame folder of PNGs next to the intended mp4
        import PIL.Image

        folder = path[:-4]
        os.makedirs(folder, exist_ok=True)
        for t, frame in enumerate(arr):
            PIL.Image.fromarray(frame).save(os.path.join(folder, f"{t:03d}.png"))


class Evaluator:
    def __init__(self, cfg: Config):
        init_distributed()
        self.cfg = cfg
        self.mesh = make_mesh(cfg.mesh_shape, tuple(cfg.mesh_axes))
        self.syn = Synthesizer(cfg)
        self.ckpt = CheckpointManager(cfg.checkpoint_path)
        params = self.syn.init_params(jax.random.PRNGKey(cfg.seed))
        m = cfg.model
        for label, load_path, which in [
            ("pe", m.load_path, m.which_iter),
            ("pg", m.pg_load_path, m.pg_iter),
            ("ii", m.ii_load_path, m.ii_iter),
        ]:
            if label in params and (load_path is not None):
                params[label] = self.ckpt.restore(label, params[label],
                                                  which=normalize_which(which),
                                                  load_path=load_path)
        self.params = replicate(params, self.mesh)
        self._predict = jax.jit(lambda p, b: self.syn.predict(p, b))
        self.inpainter = None
        if cfg.model.use_inpainter and cfg.model.use_mat_inpainter:
            from ..models.mat import MatInpainter

            self.inpainter = MatInpainter(cfg.model.inpainter_path)

    def run(self, dump: bool = True, max_batches: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        if max_batches is None:
            max_batches = cfg.max_batch_eval_vid
        ds = create_dataset(cfg, phase=cfg.data.eval_phase)
        loader = DataLoader(ds, cfg.batch_size_vid, shuffle=False,
                            num_workers=cfg.data.num_workers)
        os.makedirs(cfg.result_path, exist_ok=True)
        from ..utils.heartbeat import beat

        metrics = {}
        for i, batch in enumerate(loader):
            beat(i)  # liveness signal for the supervisor's stall watchdog
            arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            arrays = shard_batch(arrays, self.mesh)
            out_dev = dict(self._predict(self.params, arrays))
            if self.inpainter is not None and "pred_grids" in out_dev:
                from ..models.mat_pipeline import inpaint_with_mat

                out_dev["inp_pred_vid"] = inpaint_with_mat(
                    cfg, self.syn.warper,
                    lambda r: self.syn.wif.apply(self.params["ii"], r),
                    self.inpainter,
                    out_dev["pred_raw_output"], out_dev["pred_alpha"],
                    out_dev["pred_alpha_ctx"], arrays["vid"],
                    out_dev["pred_flow"], cfg.model.ctx_len, out_dev["pred_grids"],
                )
            for k in ("pred_grids", "pred_raw_output", "pred_alpha",
                      "pred_alpha_ctx", "pred_flow"):
                out_dev.pop(k, None)
            out = jax.device_get(out_dev)
            if dump:
                for name in ["real_vid", "rec_vid", "pred_vid", "inp_rec_vid", "inp_pred_vid"]:
                    if name not in out:
                        continue
                    folder = os.path.join(cfg.result_path, name)
                    os.makedirs(folder, exist_ok=True)
                    vids = out[name]
                    for b in range(vids.shape[0]):
                        # rank-aware global ids (reference synthesizer.py:
                        # 184-193): hosts dump disjoint id ranges
                        vid_id = (
                            (i * jax.process_count() + jax.process_index())
                            * vids.shape[0] + b
                        )
                        save_video_frames(
                            vids[b], os.path.join(folder, f"vid_{vid_id:05d}.mp4"),
                            fps=4,
                        )
            self._accumulate_metrics(out, metrics)
            if max_batches is not None and i + 1 >= max_batches:
                break
        return {k: float(np.mean(v)) for k, v in metrics.items()}

    def _accumulate_metrics(self, out, metrics):
        """Scalar eval aggregation (reference synthesizer_evaluator.py:35-77):
        L1 + PSNR/SSIM on predicted and reconstructed frames, full-pipeline
        (inp_*) variants when WIF is active."""
        from ..eval.metrics import psnr, ssim

        if not hasattr(self, "_metric_fns"):
            import jax as _jax

            self._metric_fns = {"psnr": _jax.jit(psnr), "ssim": _jax.jit(ssim)}
        real = out["real_vid"]
        tc = self.cfg.model.ctx_len
        for name, key in [("pred", "pred_vid"), ("rec", "rec_vid"),
                          ("inp_pred", "inp_pred_vid"), ("inp_rec", "inp_rec_vid")]:
            if key not in out:
                continue
            v = out[key]
            t0 = tc if v.shape[1] == real.shape[1] else 0
            a = ((np.clip(v[:, t0:], -1, 1) + 1) / 2).reshape((-1,) + v.shape[2:])
            b = ((np.clip(real[:, t0:], -1, 1) + 1) / 2).reshape((-1,) + real.shape[2:])
            metrics.setdefault(f"l1_{name}", []).append(float(np.abs(v[:, t0:] - real[:, t0:]).mean()))
            metrics.setdefault(f"psnr_{name}", []).append(
                float(np.mean(np.asarray(self._metric_fns["psnr"](a, b)))))
            metrics.setdefault(f"ssim_{name}", []).append(
                float(np.mean(np.asarray(self._metric_fns["ssim"](a, b)))))
