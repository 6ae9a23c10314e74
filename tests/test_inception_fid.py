"""InceptionV3 FID featurizer parity: the flax graph + BN-folding importer vs a
hand-built torch twin replicating the torchvision/pytorch-fid architecture
(BasicConv2d = conv(bias=False)+BN(eps 1e-3)+relu; FID patches: branch-pool avg
with count_include_pad=False, Mixed_7c pool branch uses max pooling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from stedm_tpu.models.inception import InceptionV3FID  # noqa: E402
from stedm_tpu.utils.torch_import import map_inception  # noqa: E402


class BasicConv2d(nn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = nn.Conv2d(i, o, bias=False, **kw)
        self.bn = nn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class IncA(nn.Module):
    def __init__(self, i, pf):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(i, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(i, pf, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x), self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x))], 1)


class IncB(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3 = BasicConv2d(i, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(i, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2)], 1)


class IncC(nn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(i, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg(x))], 1)


class IncD(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2)], 1)


class IncE(nn.Module):
    def __init__(self, i, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = BasicConv2d(i, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(i, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(i, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pooled = _avg(x) if self.pool == "avg" else F.max_pool2d(
            x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(pooled)], 1)


class TorchInceptionFID(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB(288)
        self.Mixed_6b = IncC(768, 128)
        self.Mixed_6c = IncC(768, 160)
        self.Mixed_6d = IncC(768, 160)
        self.Mixed_6e = IncC(768, 192)
        self.Mixed_7a = IncD(768)
        self.Mixed_7b = IncE(1280, "avg")
        self.Mixed_7c = IncE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("5b", "5c", "5d", "6a", "6b", "6c", "6d", "6e",
                     "7a", "7b", "7c"):
            x = getattr(self, f"Mixed_{name}")(x)
        return x.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    tm = TorchInceptionFID().eval()
    # randomize BN stats so the folding is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    return tm


def test_inception_forward_parity(twin):
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params = map_inception(sd)
    net = InceptionV3FID()
    x = np.random.default_rng(1).uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    feats_j = np.asarray(jax.jit(
        lambda a: net.apply({"params": params}, a))(jnp.asarray(x)))
    with torch.no_grad():
        feats_t = twin(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    assert feats_j.shape == (2, 2048)
    np.testing.assert_allclose(feats_j, feats_t, rtol=1e-3, atol=1e-3)


def test_fid_pipeline_with_inception_ckpt(twin, tmp_path):
    """tools/fid.py end-to-end with a staged (random-weight) inception ckpt:
    identical folders -> FID ~ 0; disjoint noise folders -> FID > 0."""
    import sys

    from PIL import Image

    sys.path.insert(0, "tools")
    import fid as fid_tool

    # identity BN stats for this ckpt: random running stats collapse random-weight
    # activations to near-constant features (dead relus compounding over depth),
    # which would make any FID ~0 regardless of input
    tm = TorchInceptionFID().eval()
    torch.manual_seed(2)
    for m in tm.modules():
        if isinstance(m, nn.Conv2d):
            nn.init.kaiming_normal_(m.weight)
    ckpt = tmp_path / "inception.pth"
    torch.save(tm.state_dict(), ckpt)

    rng = np.random.default_rng(0)
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
            a / f"img_{i}.png")
        Image.fromarray(
            np.full((32, 32, 3), 30 * (i % 5), np.uint8)).save(b / f"img_{i}.png")

    featurize = fid_tool.inception_featurizer(str(ckpt))
    fa = fid_tool.folder_features(str(a), featurize, batch=4)
    fb = fid_tool.folder_features(str(b), featurize, batch=4)
    assert fa.shape == (8, 2048)
    assert np.all(np.isfinite(fa)) and np.all(np.isfinite(fb))
    same = fid_tool.fid_from_features(fa, fa.copy())
    diff = fid_tool.fid_from_features(fa, fb)
    assert abs(same) < 1e-4
    assert diff > 10 * max(abs(same), 1e-9), (same, diff)
