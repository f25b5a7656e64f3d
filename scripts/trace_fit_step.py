"""Capture a jax.profiler device trace of the one-shot fit step and write a
top-ops summary to docs/TRACE_FIT_STEP.md (VERDICT r3 item 7): decompose the
"backward + optimizer" blob by MEASURED op time instead of end-to-end
subtraction.

--bench traces the 512^2/49k rasterizer bench step instead (VERDICT r3
item 3b: replace ROOFLINE's residual-based glue estimate with measured op
times) and writes docs/TRACE_BENCH_STEP.md.

Usage:  python scripts/trace_fit_step.py [--steps 3] [--bench]
Env:    GH_PROF_BF16=1   trace the bf16 feature pipeline
        GH_PROF_VGG=0    drop the VGG loss term
"""
import argparse
import glob
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def build_step():
    from guassianhand_tpu.data.synthetic import (SyntheticHandScene,
                                                 synthetic_batch)
    from guassianhand_tpu.models.one_shot import (OneShotAvatarModel,
                                                  OneShotConfig)
    from guassianhand_tpu.render.renderer import RendererConfig
    from guassianhand_tpu.ops.rasterize import RasterizeConfig
    from guassianhand_tpu.train.fit import (FitConfig, make_fit_step,
                                            make_optimizer)
    from guassianhand_tpu.train.losses import LossWeights

    hw = 256
    raster = RasterizeConfig(max_tiles_per_gaussian=8)
    bf16 = os.environ.get("GH_PROF_BF16", "1") == "1"
    cfg = OneShotConfig(compute_dtype="bfloat16" if bf16 else None,
                        renderer=RendererConfig(raster=raster))
    scene = SyntheticHandScene.build(n_vertices=778, subdivide=2, height=hw,
                                     width=hw)
    batch = synthetic_batch(scene, seed=0, raster=raster)
    model = OneShotAvatarModel(cfg=cfg)
    params = jax.jit(model.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), batch, hw, hw)
    vgg_fn = None
    if os.environ.get("GH_PROF_VGG", "1") == "1":
        from guassianhand_tpu.train.vgg import VGGLoss
        vgg_fn = VGGLoss()
    fit_cfg = FitConfig(weights=LossWeights(
        vgg=0.1 if vgg_fn is not None else 0.0))
    optimizer = make_optimizer(params, fit_cfg)
    opt_state = optimizer.init(params)
    step_fn = make_fit_step(lambda p, b: model.apply(p, b, hw, hw), vgg_fn,
                            optimizer, fit_cfg)
    return step_fn, params, opt_state, batch, scene.n_points, cfg


def summarize(logdir: str, out_md: str, meta: str, n_steps: int = 3,
              real_ms: float = None):
    """Parse the captured xplane into a top-ops table via
    jax.profiler.ProfileData (no external converter): aggregate the device
    plane's "XLA Ops" line by op name, plus a grouped-by-op-class table.

    real_ms: the uninstrumented step time; the doc reports the capture
    faithfulness ratio (device-op ms/step vs real). Programs with thousands
    of small ops (e.g. unrolled transformer stacks) inflate several-fold
    under per-op tracing — the grouped table is then a RANKING, not a
    decomposition."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    assert paths, f"no xplane capture under {logdir}"
    pd = jax.profiler.ProfileData.from_file(paths[-1])

    agg = {}  # name -> [total_ns, count]
    plane_used = None
    for plane in pd.planes:
        pname = plane.name or ""
        if not ("TPU" in pname or "/device:" in pname or "Device" in pname):
            continue
        for line in plane.lines:
            lname = (line.name or "").lower()
            if "xla ops" not in lname and "ops" != lname:
                continue
            plane_used = f"{pname} / {line.name}"
            for ev in line.events:
                rec = agg.setdefault(ev.name, [0, 0])
                rec[0] += ev.duration_ns
                rec[1] += 1
    lines = [
        "# Device trace — top ops (measured, not subtracted)", "",
        meta, "",
        f"Captured with `jax.profiler.trace` over {n_steps} post-warmup "
        f"steps; per-op times aggregated from the device plane "
        f"(`{plane_used}`) via `jax.profiler.ProfileData`. Regenerate: "
        "`python scripts/trace_fit_step.py [--bench]`.", "",
    ]
    if not agg:
        planes = [p.name for p in pd.planes]
        lines.append(f"(no device-op events found; planes: {planes})")
    else:
        total = sum(v[0] for v in agg.values())
        per_step = total / 1e6 / n_steps
        lines += [f"Total device op time in capture: {total/1e6:.2f} ms "
                  f"({n_steps} steps -> {per_step:.2f} ms/step)", ""]
        if real_ms:
            ratio = per_step / real_ms
            lines += [
                f"Uninstrumented step: {real_ms:.2f} ms -> capture "
                f"faithfulness {ratio:.2f}x."
                + ("" if ratio < 1.3 else
                   " Per-op tracing inflates this program (many small ops);"
                   " read the tables as a RANKING of where time goes, not"
                   " an absolute decomposition."), ""]
        # grouped by op class (fusion/while/sort/custom-call/copy/...):
        # robust to the per-op noise of huge unrolled programs
        groups = {}
        for name, (ns, cnt) in agg.items():
            cls = name.lstrip("%").split(".")[0].split(" ")[0]
            rec = groups.setdefault(cls, [0, 0])
            rec[0] += ns
            rec[1] += cnt
        lines += ["## By op class", "",
                  "| class | calls | total ms | ms/step | % |",
                  "|---|---|---|---|---|"]
        for cls, (ns, cnt) in sorted(groups.items(), key=lambda kv: -kv[1][0]):
            if ns / max(total, 1) < 0.005:
                continue
            lines.append(f"| `{cls}` | {cnt} | {ns/1e6:.2f} | "
                         f"{ns/1e6/n_steps:.2f} | {100*ns/max(total,1):.1f}% |")
        lines += ["", "## Top individual ops", "",
                  "| rank | op | calls | total ms | % |",
                  "|---|---|---|---|---|"]
        top = sorted(agg.items(), key=lambda kv: -kv[1][0])
        for i, (name, (ns, cnt)) in enumerate(top[:25]):
            lines.append(f"| {i+1} | `{name[:90]}` | {cnt} | {ns/1e6:.3f} | "
                         f"{100*ns/max(total,1):.1f}% |")
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md} ({len(agg)} distinct ops)")


def _pack_rgb_default() -> bool:
    """One shared source of truth with bench.py: pack_rgb defaults ON."""
    return os.environ.get("GH_PACK_RGB", "1") == "1"


def build_bench_step():
    """The exact bench.py fwd+bwd rasterizer step (512^2, 49k, M=9)."""
    from guassianhand_tpu.core.gaussians import Gaussians
    from guassianhand_tpu.core.camera import Camera
    from guassianhand_tpu.ops.rasterize import RasterizeConfig, rasterize

    hw, n = 512, 49152
    rng = np.random.RandomState(0)
    xyz = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gs = Gaussians(
        xyz=jnp.asarray(xyz),
        opacity=jnp.asarray(rng.uniform(0.3, 0.9, (n, 1)).astype(np.float32)),
        rotation=jnp.asarray(q),
        scaling=jnp.asarray(rng.uniform(0.002, 0.01, (n, 3))
                            .astype(np.float32)),
        shs=jnp.asarray(rng.uniform(0, 1, (n, 1, 3)).astype(np.float32)))
    f = 1.1 * hw
    K = np.array([[f, 0, hw / 2], [0, f, hw / 2], [0, 0, 1]], np.float32)
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 1.8
    cam = Camera.from_w2c(w2c, K, hw, hw)
    # default pack_rgb matches bench.py's shipped default (ON since the r4
    # +1.9% A/B) so a default trace decomposes the same config as the
    # headline number; GH_PACK_RGB=0 traces the exact-color variant.
    cfg = RasterizeConfig(max_tiles_per_gaussian=9, pairs_per_gaussian=3.0,
                          pack_rgb=_pack_rgb_default(),
                          # match bench.py's shipped default (r5): Pallas
                          # windowed one-hot segment reduction
                          segreduce_pallas=os.environ.get(
                              "GH_SEGREDUCE", "1") == "1")
    tgt = jnp.asarray(rng.uniform(0, 1, (hw, hw, 3)).astype(np.float32))

    def loss_fn(xyz, scaling, rotation, opacity1d, shs):
        # opacity crosses the jit boundary as (N,), exactly like bench.py:
        # a (N, 1) f32 parameter gets a degenerate T(1,128) tiling and its
        # entry + grad-output DMAs alone cost ~0.65 ms/step (the r5 trace's
        # rank-6 copy-start came from this script lagging the bench).
        g = Gaussians(xyz=xyz, opacity=opacity1d[:, None], rotation=rotation,
                      scaling=scaling, shs=shs)
        out = rasterize(g, cam, height=hw, width=hw, use_rgb=True, config=cfg)
        return (jnp.abs(out["comp_rgb"] - tgt).mean()
                + (out["comp_mask"] ** 2).mean())

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    args = (gs.xyz, gs.scaling, gs.rotation, gs.opacity[:, 0], gs.shs)
    return step, args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--logdir", default="/tmp/gh_trace")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    from guassianhand_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()

    if args.bench:
        out_md = args.out or "docs/TRACE_BENCH_STEP.md"
        step, sargs = build_bench_step()
        g = step(*sargs)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            g = step(*sargs)
        jax.block_until_ready(g)
        real_ms = (time.perf_counter() - t0) / args.steps * 1e3
        t0 = time.perf_counter()
        with jax.profiler.trace(args.logdir):
            for _ in range(args.steps):
                g = step(*sargs)
            jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / args.steps * 1e3
        meta = (f"Workload: bench.py 512^2 / 49,152 Gaussians fwd+bwd, M=9, "
                f"pack_rgb={int(_pack_rgb_default())}; "
                f"{dt:.2f} ms/step during capture.")
        summarize(args.logdir, out_md, meta, args.steps, real_ms=real_ms)
        return

    out_md = args.out or "docs/TRACE_FIT_STEP.md"
    step_fn, params, opt_state, batch, n_pts, cfg = build_step()
    print(f"backend={jax.devices()[0].platform} n={n_pts} "
          f"dtype={cfg.compute_dtype or 'float32'}", flush=True)
    # warm up (compile) outside the trace
    params, opt_state, loss, _ = step_fn(params, opt_state, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        params, opt_state, loss, _ = step_fn(params, opt_state, batch)
    jax.block_until_ready(loss)
    real_ms = (time.perf_counter() - t0) / args.steps * 1e3
    t0 = time.perf_counter()
    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            params, opt_state, loss, _ = step_fn(params, opt_state, batch)
        jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / args.steps * 1e3
    meta = (f"Workload: 256^2, n={n_pts} points, "
            f"compute_dtype={cfg.compute_dtype or 'float32'}, "
            f"vgg={'on' if os.environ.get('GH_PROF_VGG','1')=='1' else 'off'}"
            f"; {dt:.1f} ms/step during capture.")
    summarize(args.logdir, out_md, meta, args.steps, real_ms=real_ms)


if __name__ == "__main__":
    main()
