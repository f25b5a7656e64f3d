"""Fused Pallas projection: the EWA preprocess as ONE kernel each direction.

The XLA formulation in ops/projection.py is mathematically identical (it is
the unit-test oracle for this module). Here the whole preprocess —
world->camera, pinhole projection, clamped EWA Jacobian,
quaternion->rotation, conic + radius — runs as a single grid of
auto-pipelined Pallas blocks (forward), with a hand-derived adjoint kernel
(backward) registered via jax.custom_vjp. Reference semantics match the
CUDA rasterizer preprocess (diff-gaussian-rasterization, called at
tgs/models/renderer_one_shot.py:336-346); see ops/projection.py for the
constant conventions (near cull 0.2, 1.3*tan fov clamps, +0.3 px dilation).

MEASURED RESULT (512^2/49k bench, v5e): this kernelized version is
*slower end-to-end* than the XLA formulation (15.8-16.1 ms vs 15.3 ms per
fwd+bwd step) — XLA fuses the scalar-form projection into the neighboring
pipeline stages, and the pallas_call boundary forfeits that fusion for a
stage that is only ~150 flops/gaussian. Kept as a tested alternative
(RasterizeConfig.projection_impl="pallas") and as the pattern for
environments where the XLA lowering fragments; the default stays "xla".

depth receives no gradient (the composite treats it as an ordering key) and
radius is non-differentiable by construction, mirroring the XLA version's
stop_gradient.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guassianhand_tpu.core.camera import Camera
from guassianhand_tpu.ops.projection import (COV_DILATION, NEAR_CULL_Z,
                                             Projected)

BLOCK = 4096  # gaussians per grid step ((8, 128)-tile aligned)


def _camera_consts(camera: Camera, znear: float, zfar: float):
    """Pack every per-camera scalar the kernels need into one (32,) array."""
    w2c = camera.w2c
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    fp = camera.full_projection(znear, zfar)
    W = camera.width.astype(jnp.float32)
    H = camera.height.astype(jnp.float32)
    tan_x, tan_y = camera.tan_half_fov(W, H)
    consts = jnp.concatenate([
        R.reshape(9), t.reshape(3),                      # 0:9, 9:12
        fp[0, :4], fp[1, :4], fp[3, :4],                 # 12:16, 16:20, 20:24
        jnp.stack([camera.fx, camera.fy, 1.3 * tan_x, 1.3 * tan_y, W, H]),
    ]).astype(jnp.float32)                               # 24:30
    return consts


def _fwd_math(cs, x, y, z, sx, sy, sz, qr, qx, qy, qz):
    """Shared forward math on (B,) vectors; cs is the consts ref."""
    R00, R01, R02 = cs[0], cs[1], cs[2]
    R10, R11, R12 = cs[3], cs[4], cs[5]
    R20, R21, R22 = cs[6], cs[7], cs[8]
    t0, t1, t2 = cs[9], cs[10], cs[11]
    F00, F01, F02, F03 = cs[12], cs[13], cs[14], cs[15]
    F10, F11, F12, F13 = cs[16], cs[17], cs[18], cs[19]
    F30, F31, F32, F33 = cs[20], cs[21], cs[22], cs[23]
    fx, fy, limx, limy, W, H = (cs[24], cs[25], cs[26], cs[27], cs[28],
                                cs[29])

    pcx = R00 * x + R01 * y + R02 * z + t0
    pcy = R10 * x + R11 * y + R12 * z + t1
    tz = R20 * x + R21 * y + R22 * z + t2
    in_front = tz > NEAR_CULL_Z
    tzs = jnp.where(in_front, tz, 1.0)

    hx = F00 * x + F01 * y + F02 * z + F03
    hy = F10 * x + F11 * y + F12 * z + F13
    hw = F30 * x + F31 * y + F32 * z + F33
    pw = 1.0 / (hw + 1e-7)
    m2x = (hx * pw + 1.0) * 0.5 * W - 0.5
    m2y = (hy * pw + 1.0) * 0.5 * H - 0.5

    rx = pcx / tzs
    ry = pcy / tzs
    txtz = jnp.clip(rx, -limx, limx)
    tytz = jnp.clip(ry, -limy, limy)
    tx = txtz * tzs
    ty = tytz * tzs

    inv_z = 1.0 / tzs
    inv_z2 = inv_z * inv_z
    k0 = fx * inv_z
    k2x = fx * tx * inv_z2
    k1 = fy * inv_z
    k2y = fy * ty * inv_z2
    c00 = k0 * R00 - k2x * R20
    c01 = k0 * R01 - k2x * R21
    c02 = k0 * R02 - k2x * R22
    c10 = k1 * R10 - k2y * R20
    c11 = k1 * R11 - k2y * R21
    c12 = k1 * R12 - k2y * R22

    qnorm = jax.lax.rsqrt(qr * qr + qx * qx + qy * qy + qz * qz)
    r, xq, yq, zq = qr * qnorm, qx * qnorm, qy * qnorm, qz * qnorm
    m00 = 1 - 2 * (yq * yq + zq * zq)
    m01 = 2 * (xq * yq - r * zq)
    m02 = 2 * (xq * zq + r * yq)
    m10 = 2 * (xq * yq + r * zq)
    m11 = 1 - 2 * (xq * xq + zq * zq)
    m12 = 2 * (yq * zq - r * xq)
    m20 = 2 * (xq * zq - r * yq)
    m21 = 2 * (yq * zq + r * xq)
    m22 = 1 - 2 * (xq * xq + yq * yq)

    w00 = m00 * c00 + m10 * c01 + m20 * c02
    w01 = m01 * c00 + m11 * c01 + m21 * c02
    w02 = m02 * c00 + m12 * c01 + m22 * c02
    w10 = m00 * c10 + m10 * c11 + m20 * c12
    w11 = m01 * c10 + m11 * c11 + m21 * c12
    w12 = m02 * c10 + m12 * c11 + m22 * c12
    u0, u1, u2 = sx * w00, sy * w01, sz * w02
    v0, v1, v2 = sx * w10, sy * w11, sz * w12

    a = u0 * u0 + u1 * u1 + u2 * u2 + COV_DILATION
    b = u0 * v0 + u1 * v1 + u2 * v2
    c = v0 * v0 + v1 * v1 + v2 * v2 + COV_DILATION

    det = a * c - b * b
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe

    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(mid + disc, 0.0)))
    visible = in_front & det_ok & (radius > 0.0)
    radius = jnp.where(visible, radius, 0.0)

    return dict(pcx=pcx, pcy=pcy, tz=tz, in_front=in_front, tzs=tzs,
                hx=hx, hy=hy, pw=pw, m2x=m2x, m2y=m2y,
                rx=rx, ry=ry, tx=tx, ty=ty, inv_z=inv_z, inv_z2=inv_z2,
                c0=(c00, c01, c02), c1=(c10, c11, c12),
                qn=(r, xq, yq, zq), qnorm=qnorm,
                m=(m00, m01, m02, m10, m11, m12, m20, m21, m22),
                w0=(w00, w01, w02), w1=(w10, w11, w12),
                u=(u0, u1, u2), v=(v0, v1, v2),
                a=a, b=b, c=c, det=det, det_ok=det_ok, inv_det=inv_det,
                radius=radius, visible=visible,
                limx=cs[26], limy=cs[27], fx=cs[24], fy=cs[25])


def _proj_fwd_kernel(cs_ref, x, y, z, sx, sy, sz, qr, qx, qy, qz,
                     m2x_o, m2y_o, depth_o, cA_o, cB_o, cC_o, rad_o, vis_o):
    f = _fwd_math(cs_ref, x[...], y[...], z[...], sx[...], sy[...], sz[...],
                  qr[...], qx[...], qy[...], qz[...])
    m2x_o[...] = f["m2x"]
    m2y_o[...] = f["m2y"]
    depth_o[...] = f["tz"]
    cA_o[...] = f["c"] * f["inv_det"]
    cB_o[...] = -f["b"] * f["inv_det"]
    cC_o[...] = f["a"] * f["inv_det"]
    rad_o[...] = f["radius"]
    vis_o[...] = f["visible"].astype(jnp.float32)


def _proj_bwd_kernel(cs_ref, x, y, z, sx, sy, sz, qr, qx, qy, qz,
                     gm2x, gm2y, gA, gB, gC,
                     gx_o, gy_o, gz_o, gsx_o, gsy_o, gsz_o,
                     gqr_o, gqx_o, gqy_o, gqz_o):
    """Hand-derived adjoint of _fwd_math (recompute-forward strategy)."""
    cs = cs_ref
    f = _fwd_math(cs, x[...], y[...], z[...], sx[...], sy[...], sz[...],
                  qr[...], qx[...], qy[...], qz[...])
    R00, R01, R02 = cs[0], cs[1], cs[2]
    R10, R11, R12 = cs[3], cs[4], cs[5]
    R20, R21, R22 = cs[6], cs[7], cs[8]
    F00, F01, F02 = cs[12], cs[13], cs[14]
    F10, F11, F12 = cs[16], cs[17], cs[18]
    F30, F31, F32 = cs[20], cs[21], cs[22]
    fx, fy, limx, limy, W, H = (cs[24], cs[25], cs[26], cs[27], cs[28],
                                cs[29])

    live = f["visible"].astype(jnp.float32)
    ga = gA[...] * live
    gb = gB[...] * live
    gc = gC[...] * live
    gmx = gm2x[...] * live
    gmy = gm2y[...] * live

    # conic = (c, -b, a)/det
    inv_det = f["inv_det"]
    a, b, c = f["a"], f["b"], f["c"]
    g_c = ga * inv_det
    g_b = -gb * inv_det
    g_a = gc * inv_det
    g_det = -(ga * c - gb * b + gc * a) * inv_det * inv_det
    g_a = g_a + g_det * c
    g_c = g_c + g_det * a
    g_b = g_b - 2.0 * g_det * b

    # a = sum u^2 + d; b = sum uv; c = sum v^2 + d
    u0, u1, u2 = f["u"]
    v0, v1, v2 = f["v"]
    gu0 = 2.0 * g_a * u0 + g_b * v0
    gu1 = 2.0 * g_a * u1 + g_b * v1
    gu2 = 2.0 * g_a * u2 + g_b * v2
    gv0 = 2.0 * g_c * v0 + g_b * u0
    gv1 = 2.0 * g_c * v1 + g_b * u1
    gv2 = 2.0 * g_c * v2 + g_b * u2

    # u_j = s_j * w0_j ; v_j = s_j * w1_j
    w00, w01, w02 = f["w0"]
    w10, w11, w12 = f["w1"]
    gsx_o[...] = gu0 * w00 + gv0 * w10
    gsy_o[...] = gu1 * w01 + gv1 * w11
    gsz_o[...] = gu2 * w02 + gv2 * w12
    sxv, syv, szv = sx[...], sy[...], sz[...]
    gw00, gw01, gw02 = gu0 * sxv, gu1 * syv, gu2 * szv
    gw10, gw11, gw12 = gv0 * sxv, gv1 * syv, gv2 * szv

    # w0_j = sum_i m_ij c0_i ; w1_j = sum_i m_ij c1_i
    c00, c01, c02 = f["c0"]
    c10, c11, c12 = f["c1"]
    gm00 = gw00 * c00 + gw10 * c10
    gm01 = gw01 * c00 + gw11 * c10
    gm02 = gw02 * c00 + gw12 * c10
    gm10 = gw00 * c01 + gw10 * c11
    gm11 = gw01 * c01 + gw11 * c11
    gm12 = gw02 * c01 + gw12 * c11
    gm20 = gw00 * c02 + gw10 * c12
    gm21 = gw01 * c02 + gw11 * c12
    gm22 = gw02 * c02 + gw12 * c12
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = f["m"]
    gc00 = gw00 * m00 + gw01 * m01 + gw02 * m02
    gc01 = gw00 * m10 + gw01 * m11 + gw02 * m12
    gc02 = gw00 * m20 + gw01 * m21 + gw02 * m22
    gc10 = gw10 * m00 + gw11 * m01 + gw12 * m02
    gc11 = gw10 * m10 + gw11 * m11 + gw12 * m12
    gc12 = gw10 * m20 + gw11 * m21 + gw12 * m22

    # quaternion chain: m entries <- normalized (r, xq, yq, zq) <- raw q
    r, xq, yq, zq = f["qn"]
    g_r = 2.0 * (-gm01 * zq + gm02 * yq + gm10 * zq - gm12 * xq
                 - gm20 * yq + gm21 * xq)
    g_x = 2.0 * (gm01 * yq + gm02 * zq + gm10 * yq - gm12 * r
                 + gm20 * zq + gm21 * r) - 4.0 * xq * (gm11 + gm22)
    g_y = 2.0 * (gm01 * xq + gm02 * r + gm10 * xq + gm12 * zq
                 - gm20 * r + gm21 * zq) - 4.0 * yq * (gm00 + gm22)
    g_z = 2.0 * (-gm01 * r + gm02 * xq + gm10 * r + gm12 * yq
                 + gm20 * xq + gm21 * yq) - 4.0 * zq * (gm00 + gm11)
    # qn = q * rsqrt(|q|^2): g_q = (g_qn - qn * <qn, g_qn>) * qnorm
    dot = r * g_r + xq * g_x + yq * g_y + zq * g_z
    qnorm = f["qnorm"]
    gqr_o[...] = (g_r - r * dot) * qnorm
    gqx_o[...] = (g_x - xq * dot) * qnorm
    gqy_o[...] = (g_y - yq * dot) * qnorm
    gqz_o[...] = (g_z - zq * dot) * qnorm

    # c0_i = fx*inv_z*R0_i - fx*tx*inv_z2*R2_i (c1 analog with fy, ty, R1)
    inv_z, inv_z2 = f["inv_z"], f["inv_z2"]
    tx, ty = f["tx"], f["ty"]
    s0 = gc00 * R00 + gc01 * R01 + gc02 * R02
    s2x = gc00 * R20 + gc01 * R21 + gc02 * R22
    s1 = gc10 * R10 + gc11 * R11 + gc12 * R12
    s2y = gc10 * R20 + gc11 * R21 + gc12 * R22
    g_invz = fx * s0 + fy * s1
    g_tx = -fx * inv_z2 * s2x
    g_ty = -fy * inv_z2 * s2y
    g_invz2 = -fx * tx * s2x - fy * ty * s2y
    g_invz = g_invz + 2.0 * inv_z * g_invz2
    g_tzs = -inv_z2 * g_invz  # inv_z = 1/tzs

    # tx = clip(pcx/tzs, +-limx) * tzs: identity inside the clamp, else
    # tx = sign*limx*tzs
    clx = jnp.abs(f["rx"]) > limx
    cly = jnp.abs(f["ry"]) > limy
    g_pcx = jnp.where(clx, 0.0, g_tx)
    g_pcy = jnp.where(cly, 0.0, g_ty)
    g_tzs = (g_tzs + jnp.where(clx, jnp.sign(f["rx"]) * limx * g_tx, 0.0)
             + jnp.where(cly, jnp.sign(f["ry"]) * limy * g_ty, 0.0))

    # mean2d chain
    pw = f["pw"]
    g_ndcx = gmx * 0.5 * W
    g_ndcy = gmy * 0.5 * H
    g_hx = g_ndcx * pw
    g_hy = g_ndcy * pw
    g_pw = g_ndcx * f["hx"] + g_ndcy * f["hy"]
    g_hw = -pw * pw * g_pw

    # tzs = where(in_front, tz, 1): culled rows are invisible (live == 0)
    g_tz = jnp.where(f["in_front"], g_tzs, 0.0)

    gx_o[...] = (R00 * g_pcx + R10 * g_pcy + R20 * g_tz
                 + F00 * g_hx + F10 * g_hy + F30 * g_hw)
    gy_o[...] = (R01 * g_pcx + R11 * g_pcy + R21 * g_tz
                 + F01 * g_hx + F11 * g_hy + F31 * g_hw)
    gz_o[...] = (R02 * g_pcx + R12 * g_pcy + R22 * g_tz
                 + F02 * g_hx + F12 * g_hy + F32 * g_hw)


def _call(kernel, n_out, consts, arrs, interpret):
    n = arrs[0].shape[0]
    npad = -(-n // BLOCK) * BLOCK
    arrs = [jnp.pad(a, (0, npad - n), constant_values=-1.0) for a in arrs]
    grid = npad // BLOCK
    # PrefetchScalarGridSpec passes the scalar ref to index maps too.
    spec = pl.BlockSpec((BLOCK,), lambda i, cs: (i,))
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[spec] * len(arrs),
            out_specs=[spec] * n_out,
        ),
        out_shape=[jax.ShapeDtypeStruct((npad,), jnp.float32)] * n_out,
        interpret=interpret,
    )(consts, *arrs)
    return [o[:n] for o in outs]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _project(xyz, scaling, rotation, cam_pack, interpret):
    out, _ = _project_fwd(xyz, scaling, rotation, cam_pack, interpret)
    return out


def _project_fwd(xyz, scaling, rotation, cam_pack, interpret):
    consts = cam_pack
    arrs = [xyz[:, 0], xyz[:, 1], xyz[:, 2],
            scaling[:, 0], scaling[:, 1], scaling[:, 2],
            rotation[:, 0], rotation[:, 1], rotation[:, 2], rotation[:, 3]]
    (m2x, m2y, depth, cA, cB, cC, rad, vis) = _call(
        _proj_fwd_kernel, 8, consts, arrs, interpret)
    out = (jnp.stack([m2x, m2y], axis=1), depth,
           jnp.stack([cA, cB, cC], axis=1), rad, vis > 0.5)
    return out, (xyz, scaling, rotation, consts)


def _project_bwd(interpret, residuals, cots):
    xyz, scaling, rotation, consts = residuals
    g_mean2d, _g_depth, g_conic, _g_rad, _g_vis = cots
    arrs = [xyz[:, 0], xyz[:, 1], xyz[:, 2],
            scaling[:, 0], scaling[:, 1], scaling[:, 2],
            rotation[:, 0], rotation[:, 1], rotation[:, 2], rotation[:, 3],
            g_mean2d[:, 0], g_mean2d[:, 1],
            g_conic[:, 0], g_conic[:, 1], g_conic[:, 2]]
    (gx, gy, gz, gsx, gsy, gsz, gqr, gqx, gqy, gqz) = _call(
        _proj_bwd_kernel, 10, consts, arrs, interpret)
    return (jnp.stack([gx, gy, gz], axis=1),
            jnp.stack([gsx, gsy, gsz], axis=1),
            jnp.stack([gqr, gqx, gqy, gqz], axis=1),
            jnp.zeros_like(consts))


_project.defvjp(_project_fwd, _project_bwd)


def project_gaussians_pallas(
    xyz: jax.Array,
    scaling: jax.Array,
    rotation: jax.Array,
    camera: Camera,
    *,
    scale_modifier: float = 1.0,
    znear: float = 0.01,
    zfar: float = 1000.0,
    interpret: bool = False,
) -> Projected:
    """Drop-in fused-kernel equivalent of ops.projection.project_gaussians."""
    consts = _camera_consts(camera, znear, zfar)
    s = scaling * scale_modifier if scale_modifier != 1.0 else scaling
    mean2d, depth, conic, radius, visible = _project(
        xyz, s, rotation, consts, interpret)
    return Projected(mean2d=mean2d, depth=depth, conic=conic,
                     radius=jax.lax.stop_gradient(radius), visible=visible)
