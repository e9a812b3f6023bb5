"""Reference-checkpoint importer: layerwise golden parity vs torch mirrors.

Builds torch modules that mirror the reference architecture EXACTLY as
specified (``/root/reference/models/patch_embedder.py:16-90``,
``models/patchnet.py:68-84,192-210``, ``models/BUFFERX.py:39-69``), runs
random weights + random inputs through them, saves a ``state_dict`` with
the reference's key names, imports it with
:mod:`bufferx_tpu.tools.torch_import`, and asserts our flax models produce
the same outputs — validating the weight mapping AND the architectural
parity (padding, pooling, normalization, cost-volume rolls) in one shot.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bufferx_tpu.models.heads import CostVolume  # noqa: E402
from bufferx_tpu.models.spinnet import MiniSpinNet  # noqa: E402
from bufferx_tpu.tools.torch_import import (  # noqa: E402
    desc_variables_from_reference,
    load_state_dict,
    pose_variables_from_reference,
)

RAD, ELE, AZI = 3, 7, 20
NS = 10


def _pad_cyl_torch(x, p=1):
    """Reference ``pad_image``: wrap azimuth (last dim), zero elevation."""
    x = torch.cat([x[..., -p:], x, x[..., :p]], dim=-1)
    zshape = list(x.shape)
    zshape[-2] = p
    z = torch.zeros(zshape, dtype=x.dtype)
    return torch.cat([z, x, z], dim=-2)


class RefCylindricalNet(tnn.Module):
    """Mirror of ``Cylindrical_Net`` (``models/patchnet.py:68-84``) with
    ops indices matching ``Cyclindrical_ConvNet._add_conv_*``."""

    def __init__(self):
        super().__init__()
        ops = [
            tnn.Conv3d(16, 64, 3), tnn.BatchNorm3d(64, affine=False),
            tnn.ReLU(),
        ]
        chans = [(64, 64), (64, 128), (128, 128), (128, 64), (64, 64),
                 (64, 32)]
        for ci, co in chans:
            ops += [tnn.Conv2d(ci, co, 3), tnn.BatchNorm2d(co, affine=False),
                    tnn.ReLU()]
        ops += [tnn.Conv2d(32, 32, 3)]
        self.ops = tnn.ModuleList(ops)

    def forward(self, x):
        for op in self.ops:
            if isinstance(op, tnn.Conv3d):
                x = op(_pad_cyl_torch(x))
            elif isinstance(op, tnn.Conv2d):
                if x.dim() == 5:
                    x = x.squeeze(2)
                x = op(_pad_cyl_torch(x))
            else:
                x = op(x)
        return x


class RefMiniSpinNet(tnn.Module):
    """Mirror of the neural half of ``MiniSpinNet``
    (``models/patch_embedder.py:26-41,73-90``)."""

    def __init__(self):
        super().__init__()
        self.pnt_layer = tnn.Sequential(
            tnn.Conv2d(3, 16, 1), tnn.BatchNorm2d(16), tnn.ReLU()
        )
        self.pool_layer = tnn.Sequential(
            tnn.Conv2d(32, 16, 1), tnn.BatchNorm2d(16), tnn.ReLU(),
            tnn.Conv2d(16, 1, 1), tnn.BatchNorm2d(1), tnn.ReLU(),
        )
        self.conv_net = RefCylindricalNet()

    def forward(self, inv_patches):
        # inv_patches: [K, G, ns, 3] (our convention) -> torch channel-first
        x = inv_patches.permute(0, 3, 1, 2)                # [K, 3, G, ns]
        x = self.pnt_layer(x)
        x = tF.max_pool2d(x, kernel_size=(1, x.shape[-1])).squeeze(3)
        x = x.view(x.shape[0], x.shape[1], RAD, ELE, AZI)
        x = self.conv_net(x)                               # [K, 32, ele, azi]
        w = self.pool_layer(x)
        f = tF.avg_pool2d(x * w, kernel_size=(x.shape[2], x.shape[3]))
        f = tF.normalize(f.view(f.shape[0], -1), p=2, dim=1)
        equi = tF.normalize(x, p=2, dim=1)
        return f, equi


class RefCostVolume(tnn.Module):
    """Mirror of ``CostVolume`` + ``CostNet`` (``models/BUFFERX.py:39-69``,
    ``models/patchnet.py:192-210`` — CostNet's forward applies NO padding)."""

    def __init__(self):
        super().__init__()
        specs = [(32, 32, (3, 3, 3)), (32, 64, (3, 3, 3)),
                 (64, 64, (3, 1, 3)), (64, 128, (3, 1, 3)),
                 (128, 128, (3, 1, 3)), (128, 64, (3, 1, 3)),
                 (64, 64, (3, 1, 3)), (64, 32, (3, 1, 3)),
                 (32, 32, (3, 1, 3))]
        ops = []
        for ci, co, k in specs:
            ops += [tnn.Conv3d(ci, co, k), tnn.BatchNorm3d(co, affine=False),
                    tnn.ReLU()]
        ops += [tnn.Conv3d(32, 20, (2, 1, 2))]
        self.ops = tnn.ModuleList(ops)

    def forward(self, des1, des2):
        # des1/des2: [B, C, Ke, L]; roll index (l - i) % L over shifts i
        b, c, ke, L = des1.shape
        idx = (torch.arange(L)[None, :] - torch.arange(L)[:, None]) % L
        rolled = des1[:, :, :, idx.reshape(-1)].reshape(b, c, ke, L, L)
        rolled = rolled.permute(0, 1, 3, 2, 4)             # [B, C, S, Ke, L]
        cost = rolled - des2.unsqueeze(2)
        x = cost
        for op in self.ops:
            x = op(x)
        logits = x.reshape(b, 20)
        prob = tF.softmax(logits, dim=-1)
        return torch.sum(prob * torch.arange(0, 20)[None], dim=-1)


class RefBufferX(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Desc = RefMiniSpinNet()

        class _Pose(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = RefCostVolume()

        self.Pose = _Pose()


def _randomize_bn_stats(module, gen):
    """Non-trivial running stats so the parity test exercises them."""
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm3d)):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=gen) * 0.1
            )
            m.running_var.copy_(
                1.0 + 0.5 * torch.rand(m.running_var.shape, generator=gen)
            )


@pytest.fixture(scope="module")
def ref_model(tmp_path_factory):
    gen = torch.Generator().manual_seed(0)
    model = RefBufferX()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        _randomize_bn_stats(model, gen)
    model.eval()
    path = tmp_path_factory.mktemp("ckpt") / "best.pth"
    torch.save(model.state_dict(), str(path))
    return model, str(path)


def test_state_dict_roundtrip_no_torch_parser(ref_model):
    """The dependency-free parser reads torch.save output bit-exactly."""
    from bufferx_tpu.tools.torch_import import _load_without_torch

    model, path = ref_model
    via_torch = {k: v.numpy() for k, v in torch.load(
        path, map_location="cpu", weights_only=True).items()}
    manual = _load_without_torch(path)
    assert set(manual) == set(via_torch)
    for k in via_torch:
        np.testing.assert_array_equal(np.asarray(manual[k]),
                                      via_torch[k], err_msg=k)


def test_desc_forward_parity(ref_model):
    model, path = ref_model
    sd = load_state_dict(path)
    variables = desc_variables_from_reference(
        {k: v for k, v in sd.items() if "Desc" in k}
    )
    rs = np.random.RandomState(1)
    inv = rs.randn(4, RAD * ELE * AZI, NS, 3).astype(np.float32)

    with torch.no_grad():
        f_t, equi_t = model.Desc(torch.from_numpy(inv))

    net = MiniSpinNet(rad_n=RAD, ele_n=ELE, azi_n=AZI, mode="sampled")
    out = net.apply(variables, jnp.asarray(inv), train=False)

    np.testing.assert_allclose(
        np.asarray(out["desc"]), f_t.numpy(), atol=2e-5,
        err_msg="invariant descriptor mismatch")
    np.testing.assert_allclose(
        np.asarray(out["equi"]), equi_t.numpy(), atol=2e-5,
        err_msg="equivariant map mismatch")


def test_pose_forward_parity(ref_model):
    model, path = ref_model
    sd = load_state_dict(path)
    variables = pose_variables_from_reference(
        {k: v for k, v in sd.items() if "Pose" in k}
    )
    rs = np.random.RandomState(2)
    d1 = rs.randn(3, 32, ELE - 2, AZI).astype(np.float32)
    d2 = rs.randn(3, 32, ELE - 2, AZI).astype(np.float32)

    with torch.no_grad():
        ind_t = model.Pose.conv(torch.from_numpy(d1), torch.from_numpy(d2))

    head = CostVolume(azi_n=AZI)
    ind_j = head.apply(variables, jnp.asarray(d1), jnp.asarray(d2),
                       train=False)
    np.testing.assert_allclose(np.asarray(ind_j), ind_t.numpy(), atol=1e-4)


def test_import_snapshot_end_to_end(ref_model, tmp_path):
    """Full staged import -> compose_staged_params -> registration params."""
    import os

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.pipeline.registration import init_params
    from bufferx_tpu.tools.torch_import import import_reference_snapshot
    from bufferx_tpu.train.trainer import compose_staged_params

    _, path = ref_model
    src = tmp_path / "ref"
    for stage in ("Desc", "Pose"):
        os.makedirs(src / stage, exist_ok=True)
        (src / stage / "best.pth").write_bytes(
            open(path, "rb").read()
        )
    out = tmp_path / "imported"
    cfg = make_cfg("3DMatch")
    assert cfg.patch.desc_mode == "sampled"
    template = init_params(cfg, jax.random.PRNGKey(0))
    import_reference_snapshot(str(src), str(out), template)

    composed = compose_staged_params(
        str(out / "Desc" / "best.msgpack"),
        str(out / "Pose" / "best.msgpack"),
        template,
    )
    # every leaf present, shaped like the template, and finite
    for a, b in zip(jax.tree.leaves(composed), jax.tree.leaves(template)):
        assert a.shape == b.shape
        assert bool(jnp.all(jnp.isfinite(a)))


class TestSerializationQuirks:
    """Torch-free parser vs real torch serialization quirks (round-5
    VERDICT #7): shared storages, storage offsets, non-contiguous
    strides, expanded (stride-0) views, and the dtype zoo."""

    def _roundtrip(self, sd, tmp_path):
        from bufferx_tpu.tools.torch_import import _load_without_torch

        path = tmp_path / "quirks.pth"
        torch.save(sd, str(path))
        manual = _load_without_torch(str(path))
        via_torch = torch.load(str(path), map_location="cpu",
                               weights_only=True)
        assert set(manual) == set(via_torch)
        return manual, via_torch

    def test_shared_storage_and_offsets(self, tmp_path):
        base = torch.randn(40)
        sd = {
            "a": base[:10],          # offset 0, shares storage with b/c
            "b": base[10:30],        # offset 10
            "c": base[25:],          # overlapping view, offset 25
            "whole": base,
        }
        manual, ref = self._roundtrip(sd, tmp_path)
        for k in sd:
            np.testing.assert_array_equal(
                np.asarray(manual[k]), ref[k].numpy(), err_msg=k
            )

    def test_noncontiguous_strides(self, tmp_path):
        m = torch.randn(6, 8)
        sd = {
            "transposed": m.t(),                   # stride (1, 8)
            "strided_rows": m[::2],                # stride (16, 1)
            "strided_cols": m[:, ::2],             # stride (8, 2)
            "expanded": torch.randn(1, 5).expand(4, 5),   # stride (0, 1)
            "scalar": torch.tensor(3.25),
        }
        manual, ref = self._roundtrip(sd, tmp_path)
        for k in sd:
            got = np.asarray(manual[k])
            want = ref[k].numpy()
            assert got.shape == want.shape, k
            np.testing.assert_array_equal(got, want, err_msg=k)

    def test_dtype_zoo(self, tmp_path):
        sd = {
            "f16": torch.randn(5, 3).half(),
            "f64": torch.randn(5, 3).double(),
            "f32": torch.randn(5, 3),
            "i64": torch.arange(7),
            "i32": torch.arange(7, dtype=torch.int32),
            "u8": torch.arange(7, dtype=torch.uint8),
            "bool": torch.tensor([True, False, True]),
        }
        manual, ref = self._roundtrip(sd, tmp_path)
        for k in sd:
            got = np.asarray(manual[k])
            want = ref[k].numpy()
            assert got.dtype == want.dtype, (k, got.dtype, want.dtype)
            np.testing.assert_array_equal(got, want, err_msg=k)

    def test_bfloat16_bits(self, tmp_path):
        from bufferx_tpu.tools.torch_import import _load_without_torch

        t = torch.randn(4, 4).to(torch.bfloat16)
        path = tmp_path / "bf16.pth"
        torch.save({"w": t}, str(path))
        manual = _load_without_torch(str(path))
        got_f32 = (
            np.asarray(manual["w"]).astype(np.uint32) << 16
        ).view(np.float32)
        np.testing.assert_array_equal(got_f32, t.float().numpy())


def test_imported_weights_through_full_pipeline(ref_model, tmp_path):
    """End-to-end: imported reference weights drive the FULL registration
    pipeline, and both parse routes (torch / torch-free) produce the
    identical pose on a fixed pair (round-5 VERDICT #7)."""
    import os

    from bufferx_tpu.config import make_cfg
    from bufferx_tpu.core import se3
    from bufferx_tpu.data.modelnet import synthetic_pair_full_overlap
    from bufferx_tpu.pipeline.registration import (
        PipelineStatics,
        init_params,
        prepare_cloud,
        register_pair_jit,
    )
    from bufferx_tpu.tools.torch_import import (
        _load_without_torch,
        desc_variables_from_reference,
        pose_variables_from_reference,
    )

    _, path = ref_model
    cfg = make_cfg("3DMatch").override(
        capacity=dict(max_points=1536, num_ransac_hypotheses=512,
                      ransac_chunk=128, sphere_query_chunk=64),
        patch=dict(num_fps=192, num_points_radius_estimate=192,
                   num_points_per_patch=96, num_scales=2,
                   search_radius_thresholds=(5.0, 2.0), voxel_sample=NS),
    )
    assert cfg.patch.desc_mode == "sampled"
    template = init_params(cfg, jax.random.PRNGKey(0))

    poses = {}
    for route in ("torch", "manual"):
        sd = (load_state_dict(path) if route == "torch"
              else _load_without_torch(path))
        sd = {k: np.asarray(v) for k, v in sd.items()}
        params = {
            "desc": desc_variables_from_reference(
                {k: v for k, v in sd.items() if "Desc" in k}),
            "pose": pose_variables_from_reference(
                {k: v for k, v in sd.items() if "Pose" in k}),
        }
        # template-shape check: imported trees must match init exactly
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(template)):
            assert np.asarray(a).shape == np.asarray(b).shape
        statics = PipelineStatics.from_config(cfg)
        rs = np.random.RandomState(42)
        s, t, T = synthetic_pair_full_overlap(rs, num_points=1400)
        res = register_pair_jit(
            params, statics,
            prepare_cloud(s, cfg, seed=0), prepare_cloud(t, cfg, seed=0),
            jnp.asarray(False), jax.random.PRNGKey(3),
        )
        assert bool(jnp.isfinite(res.pose).all())
        poses[route] = np.asarray(res.pose)
    np.testing.assert_allclose(poses["torch"], poses["manual"], atol=1e-6)
