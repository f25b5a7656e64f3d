"""Golden-render fixtures: fixed-seed anchors against compounded drift.

Three rounds of perf knobs each moved pixels "provably a little" (pack_rgb
quantizes colors to 1/1023, bf16 reassociates the feature pipeline,
grad_segsort reorders backward sums). Numeric parity tests bound each knob
alone; these goldens bound the COMPOUND: four fixed-seed renders of the
flagship configuration (bf16 + pack_rgb) are checked into tests/goldens/ as
uint8 PNGs and every run must stay within the documented tolerance.

Tolerance budget (uint8 steps out of 255):
  pack_rgb quantization   1/1023  -> 0.25 steps (applied pre-blend, can
                                     accumulate over ~tens of blended pairs)
  bf16 feature pipeline   ~1e-3 relative on hidden features -> <=1 step
                                     after the sigmoid color head
  XLA reassociation       fusion-order fp32 noise, ~1e-6   -> ~0 steps
Gate: max |delta| <= 4 steps, mean |delta| <= 0.5 steps. A real regression
(wrong kernel, broken sort, flipped mask) moves whole regions by >> 10 steps;
compounded quantization drift stays in low single digits.

Regenerate (only after an INTENDED visual change, with the diff reviewed):
    python -m tests.golden_common --write
Matches the reference's de-facto visual QA loop of dumping images every
step (infer_one_shot.py:493-510) — here pinned to fixed seeds and asserted.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
HW = 128
MAX_STEP_TOL = 4      # uint8 steps
MEAN_STEP_TOL = 0.5


def _build():
    from guassianhand_tpu.data.rays import orbit_cameras
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import (OneShotAvatarModel,
                                                  OneShotConfig)
    from guassianhand_tpu.ops.rasterize import RasterizeConfig
    from guassianhand_tpu.render.renderer import EditConfig, RendererConfig

    # flagship render semantics (configs/one_shot.yaml): pack_rgb + r5
    # compact-walk enumeration. M=4 bounds LIVE tile need at this scene
    # (checked below: overflow must be 0 or the goldens are meaningless).
    raster = RasterizeConfig(interpret=True, max_tiles_per_gaussian=4,
                             pairs_per_gaussian=2.5, walk_cells=25,
                             pack_rgb=True)
    cfg = OneShotConfig(residual_map_hw=(256, 512),
                        compute_dtype="bfloat16",  # flagship default
                        renderer=RendererConfig(raster=raster))
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=1, height=HW,
                                     width=HW)
    batch = synthetic_batch(scene, seed=0, raster=raster, with_target=False)
    model = OneShotAvatarModel(cfg=cfg)
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), batch, HW, HW)

    # Give the per-identity appearance learnables deterministic NON-zero
    # values so the edit paths (per-hand color_w, color_b zeroing/swap)
    # visibly differ from the plain render.
    p = dict(params["params"])
    rng = np.random.RandomState(7)
    p["color_b"] = jnp.asarray(
        0.3 * rng.normal(size=p["color_b"].shape), jnp.float32)
    p["color_w"] = jnp.asarray(
        1.0 + 0.2 * rng.normal(size=p["color_w"].shape), jnp.float32)
    p["opacity_b"] = jnp.asarray(
        0.1 * rng.normal(size=p["opacity_b"].shape), jnp.float32)
    params = {"params": p}

    def render(batch, edit=EditConfig()):
        out = jax.jit(
            lambda pp, bb: model.apply(pp, bb, HW, HW, edit=edit)
        )(params, batch)
        assert int(np.asarray(out["overflow"]).sum()) == 0, \
            "golden render dropped pairs — raise M before trusting anchors"
        return np.asarray(jnp.clip(out["comp_rgb"][0, 0], 0, 1))

    images = {}
    images["flagship"] = render(batch)
    images["edit_left_only"] = render(
        batch, EditConfig(enabled=True, edit_left_only=True))
    images["edit_duplication"] = render(
        batch, EditConfig(enabled=True, duplication=True))

    # one 360-orbit frame (cli/render_360.py path)
    pts = np.asarray(batch["points"][0])
    center = pts.mean(axis=0)
    w2cs, Ks = orbit_cameras(center, 0.8, np.asarray(scene.K), n_views=8)
    b360 = dict(batch)
    b360["w2c_render"] = jnp.asarray(w2cs[2:3], jnp.float32)[None]
    b360["K_render"] = jnp.asarray(Ks[2:3], jnp.float32)[None]
    images["orbit_f2"] = render(b360)
    return images


def _to_u8(img: np.ndarray) -> np.ndarray:
    return np.round(img * 255.0).clip(0, 255).astype(np.uint8)


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.png")


def write_goldens():
    from PIL import Image
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, img in _build().items():
        Image.fromarray(_to_u8(img)).save(golden_path(name))
        print(f"wrote {golden_path(name)}")


def compare_goldens():
    """Render all anchors and return {name: (max_step, mean_step)}."""
    from PIL import Image
    out = {}
    for name, img in _build().items():
        want = np.asarray(Image.open(golden_path(name)), np.int16)
        got = _to_u8(img).astype(np.int16)
        assert want.shape == got.shape, (name, want.shape, got.shape)
        delta = np.abs(want - got)
        out[name] = (int(delta.max()), float(delta.mean()))
    return out


if __name__ == "__main__":
    import sys
    # goldens are generated AND compared on host CPU (the CI backend);
    # running as a module bypasses tests/conftest.py, so pin it here
    jax.config.update("jax_platforms", "cpu")
    if "--write" in sys.argv:
        write_goldens()
    else:
        for name, (mx, mean) in compare_goldens().items():
            print(f"{name}: max {mx} mean {mean:.3f}")
