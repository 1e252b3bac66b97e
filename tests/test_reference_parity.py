"""End-to-end numeric parity with the REAL reference PyTorch models.

Instantiates the actual `TemporalUnet1D` from
`/root/reference/model/diffusion_1d.py:517` (torch-cpu), converts its real
`state_dict()` with `utils/torch_convert.py`, and asserts flax-vs-torch
forward agreement — the whole-model check the synthetic-state-dict tests in
`test_torch_convert.py` cannot give (GroupNorm eps, Mish, softmax-kernel
linear attention, ConvTranspose semantics, horizon-aware stage flags all
have to agree at once). Also covers `load_reference_checkpoint` against a
faithfully-nested EMA(GaussianDiffusion1D) checkpoint, and the 2D `Unet` /
`ForceUnet` (`model/diffusion_2d.py:281,411`).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "model")), reason="reference not mounted"
    ),
]

torch = pytest.importorskip("torch")


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_diffusion_1d():
    """Import the real reference module with its unavailable deps stubbed
    (ema_pytorch / torch_geometric / pymunk-backed cindm.utils are not
    needed for a bare model forward)."""
    if "cindm.model.diffusion_1d" in sys.modules:
        return sys.modules["cindm.model.diffusion_1d"]
    pkg = types.ModuleType("cindm")
    pkg.__path__ = [REF]
    sys.modules["cindm"] = pkg
    _stub("ema_pytorch", EMA=type("EMA", (), {}))
    _stub("torch_geometric")
    _stub("torch_geometric.data")
    _stub("torch_geometric.data.dataloader", DataLoader=object)
    sys.modules["torch_geometric"].data = sys.modules["torch_geometric.data"]

    class _P:
        def print(self, *a, **k):
            pass

    _stub(
        "cindm.utils",
        p=_P(),
        get_item_1d=None,
        COLOR_LIST=["b", "r", "g"],
        CustomLoss=type("CustomLoss", (), {}),
        Printer=_P,
        CustomSampler=object,
        visulization=None,
        caculate_confidence_interval=None,
        eval_simu=None,
        get_random_walk_noise=None,
    )
    _stub("cindm.data")
    _stub("cindm.data.nbody_dataset", NBodyDataset=object)
    _stub("cindm.filepath", EXP_PATH="/tmp/", AIRFOILS_PATH="/tmp/", NBODY_PATH="/tmp/")
    import importlib

    return importlib.import_module("cindm.model.diffusion_1d")


def _sd_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


@pytest.mark.parametrize(
    "horizon,feat,dim,attention",
    [
        (24, 8, 64, True),   # flagship: 2-body 24-step window (train_1d.py:102-117)
        (24, 8, 32, False),
        (20, 8, 32, True),   # horizon % 4 stage rules (diffusion_1d.py:550-601)
        (12, 16, 32, True),  # horizon % 4, 4-body features
    ],
)
def test_temporal_unet1d_forward_parity(ref_diffusion_1d, horizon, feat, dim, attention):
    import jax.numpy as jnp

    from cindm_tpu.models import TemporalUnet1D
    from cindm_tpu.utils.torch_convert import convert_temporal_unet1d

    torch.manual_seed(0)
    tmodel = ref_diffusion_1d.TemporalUnet1D(
        horizon=horizon, transition_dim=feat, cond_dim=False,
        dim=dim, dim_mults=(1, 2, 4, 8), attention=attention,
    ).eval()
    params = convert_temporal_unet1d(
        _sd_numpy(tmodel), horizon=horizon, dim_mults=(1, 2, 4, 8), attention=attention
    )
    jmodel = TemporalUnet1D(
        horizon=horizon, transition_dim=feat, dim=dim,
        dim_mults=(1, 2, 4, 8), attention=attention,
    )

    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, horizon, feat)).astype(np.float32) * 0.5
    t = np.array([0, 377, 999], np.int64)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x), torch.from_numpy(t), None).numpy()
    ours = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(t)))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=1e-4, rtol=1e-4)


@pytest.fixture(scope="module")
def ref_diffusion_2d(ref_diffusion_1d):
    """Import the real reference 2D module (reuses the 1D fixture's stubs)."""
    if "cindm.model.diffusion_2d" in sys.modules:
        return sys.modules["cindm.model.diffusion_2d"]
    _stub("cindm.data.airfoil_dataset", Ellipse=object)
    _stub("torch_geometric.nn", GCNConv=object)
    _stub("torchvision", transforms=types.ModuleType("T"), utils=types.ModuleType("u"))
    import importlib

    return importlib.import_module("cindm.model.diffusion_2d")


def test_unet2d_forward_parity(ref_diffusion_2d):
    import jax.numpy as jnp

    from cindm_tpu.models import Unet2D
    from cindm_tpu.utils.torch_convert import convert_unet2d

    torch.manual_seed(2)
    tmodel = ref_diffusion_2d.Unet(dim=16, dim_mults=(1, 2), channels=5).eval()
    params = convert_unet2d(_sd_numpy(tmodel), dim_mults=(1, 2))
    jmodel = Unet2D(dim=16, dim_mults=(1, 2), channels=5)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 16, 16)).astype(np.float32) * 0.5  # NCHW
    t = np.array([7, 512], np.int64)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = np.asarray(
        jmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    ).transpose(0, 3, 1, 2)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=1e-4, rtol=1e-4)


def test_forceunet_forward_parity(ref_diffusion_2d):
    import jax.numpy as jnp

    from cindm_tpu.models import ForceUnet
    from cindm_tpu.utils.torch_convert import convert_forceunet

    torch.manual_seed(3)
    tmodel = ref_diffusion_2d.ForceUnet(dim=16, dim_mults=(1, 2, 4, 8), channels=4).eval()
    # reference mid_dim is dim*8 = 128; its final layer is Linear(512, 2) built
    # for dim 64 — rebuild to the matching width for this small test config
    tmodel.final = torch.nn.Linear(128, 2)
    params = convert_forceunet(_sd_numpy(tmodel), dim_mults=(1, 2, 4, 8))
    jmodel = ForceUnet(dim=16, dim_mults=(1, 2, 4, 8))

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 4, 32, 32)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x)).numpy()
    ours = np.asarray(jmodel.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=1e-4, rtol=1e-4)


def test_load_reference_checkpoint_real_nesting(ref_diffusion_1d, tmp_path):
    """The reference saves ema.state_dict() of EMA(GaussianDiffusion1D): Unet
    keys live at 'ema_model.model.*' with diffusion buffers as siblings
    (`model/diffusion_1d.py:2639-2647`). Build that nesting from the REAL
    torch modules and check load_reference_checkpoint converts it."""
    import jax.numpy as jnp

    from cindm_tpu.models import TemporalUnet1D
    from cindm_tpu.utils.torch_convert import load_reference_checkpoint

    torch.manual_seed(1)
    tmodel = ref_diffusion_1d.TemporalUnet1D(
        horizon=8, transition_dim=8, cond_dim=False, dim=16,
        dim_mults=(1, 2, 4, 8), attention=True,
    ).eval()
    diffusion = ref_diffusion_1d.GaussianDiffusion1D(
        tmodel, image_size=8, timesteps=20, sampling_timesteps=10,
        conditioned_steps=0,
    )
    dsd = diffusion.state_dict()
    ema_sd = {f"ema_model.{k}": v for k, v in dsd.items()}
    ema_sd.update({f"online_model.{k}": v.clone() for k, v in dsd.items()})
    ema_sd["initted"] = torch.tensor(True)
    ema_sd["step"] = torch.tensor(123)
    ckpt = {"step": 123, "model": dsd, "ema": ema_sd, "opt": None, "scaler": None}
    path = tmp_path / "model-1.pt"
    torch.save(ckpt, path)

    params = load_reference_checkpoint(
        str(path), horizon=8, dim_mults=(1, 2, 4, 8), attention=True
    )
    jmodel = TemporalUnet1D(horizon=8, transition_dim=8, dim=16, attention=True)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8)).astype(np.float32) * 0.5
    t = np.array([3, 17], np.int64)
    with torch.no_grad():
        ref_out = tmodel(torch.from_numpy(x), torch.from_numpy(t), None).numpy()
    ours = np.asarray(jmodel.apply(params, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref_out, atol=1e-4, rtol=1e-4)
