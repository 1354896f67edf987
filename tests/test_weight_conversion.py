"""Torch-checkpoint conversion parity test.

Builds a plain-torch twin of the reference DreamHourglass module structure
(same state_dict key names as reference dream/models.py:557-759, no
torchvision needed), runs a forward pass, converts the state_dict with
scripts/convert_torch_weights.py, and checks the flax model reproduces the
torch output to float tolerance.  This is what guarantees the reference's
released .pth checkpoints load correctly for inference parity.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from convert_torch_weights import convert_vgg  # noqa: E402
from dream_tpu.models import DreamHourglass  # noqa: E402


def _torch_hourglass(n_keypoints=3, in_channels=3):
    """Plain-torch module with the reference's exact state_dict layout."""

    class TorchHourglass(nn.Module):
        def __init__(self):
            super().__init__()
            self.down_sample = nn.MaxPool2d(2)

            def seq(named_layers):
                s = nn.Sequential()
                for name, layer in named_layers:
                    s.add_module(name, layer)
                return s

            self.layer_0_1_down = seq([
                ("0", nn.Conv2d(in_channels, 64, 3, 1, 1)), ("1", nn.ReLU()),
                ("2", nn.Conv2d(64, 64, 3, 1, 1)), ("3", nn.ReLU()),
            ])
            self.layer_0_2_down = seq([
                ("5", nn.Conv2d(64, 128, 3, 1, 1)), ("6", nn.ReLU()),
                ("7", nn.Conv2d(128, 128, 3, 1, 1)), ("8", nn.ReLU()),
            ])
            self.layer_0_3_down = seq([
                ("10", nn.Conv2d(128, 256, 3, 1, 1)), ("11", nn.ReLU()),
                ("12", nn.Conv2d(256, 256, 3, 1, 1)), ("13", nn.ReLU()),
                ("14", nn.Conv2d(256, 256, 3, 1, 1)), ("15", nn.ReLU()),
                ("16", nn.Conv2d(256, 256, 3, 1, 1)), ("17", nn.ReLU()),
            ])
            self.layer_0_4_down = seq([
                ("19", nn.Conv2d(256, 512, 3, 1, 1)), ("20", nn.ReLU()),
                ("21", nn.Conv2d(512, 512, 3, 1, 1)), ("22", nn.ReLU()),
                ("23", nn.Conv2d(512, 512, 3, 1, 1)), ("24", nn.ReLU()),
                ("25", nn.Conv2d(512, 512, 3, 1, 1)), ("26", nn.ReLU()),
            ])
            self.layer_0_5_down = seq([
                ("28", nn.Conv2d(512, 512, 3, 1, 1)), ("29", nn.ReLU()),
                ("30", nn.Conv2d(512, 512, 3, 1, 1)), ("31", nn.ReLU()),
                ("32", nn.Conv2d(512, 512, 3, 1, 1)), ("33", nn.ReLU()),
                ("34", nn.Conv2d(512, 512, 3, 1, 1)), ("35", nn.ReLU()),
            ])
            self.upsample_0_4 = seq([
                ("0", nn.Upsample(scale_factor=2)),
                ("4", nn.Conv2d(512, 256, 3, 1, 1)), ("5", nn.ReLU()),
                ("6", nn.Conv2d(256, 256, 3, 1, 1)),
            ])
            self.upsample_0_3 = seq([
                ("0", nn.Upsample(scale_factor=2)),
                ("4", nn.Conv2d(256, 128, 3, 1, 1)), ("5", nn.ReLU()),
                ("6", nn.Conv2d(128, 64, 3, 1, 1)),
            ])
            self.heads_0 = seq([
                ("0", nn.Conv2d(64, 64, 3, 1, 1)), ("1", nn.ReLU()),
                ("2", nn.Conv2d(64, 32, 3, 1, 1)), ("3", nn.ReLU()),
                ("4", nn.Conv2d(32, n_keypoints, 3, 1, 1)),
            ])

        def forward(self, x):
            x = self.layer_0_1_down(x)
            x = self.down_sample(x)
            x = self.layer_0_2_down(x)
            x = self.down_sample(x)
            x = self.layer_0_3_down(x)
            x = self.down_sample(x)
            x = self.layer_0_4_down(x)
            x = self.down_sample(x)
            x = self.layer_0_5_down(x)
            x = self.upsample_0_4(x)
            x = self.upsample_0_3(x)
            return self.heads_0(x)

    return TorchHourglass()


def test_hourglass_conversion_value_parity():
    torch.manual_seed(0)
    tmodel = _torch_hourglass(n_keypoints=3)
    tmodel.eval()

    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()  # [1, 3, 16, 16]

    variables = convert_vgg(tmodel.state_dict())
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    fmodel = DreamHourglass(n_keypoints=3)
    f_out = fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))[0]
    f_out_nchw = np.moveaxis(np.asarray(f_out), -1, 1)

    np.testing.assert_allclose(f_out_nchw, t_out, atol=2e-4)


def test_pth_file_roundtrip_through_cli(tmp_path):
    """End-to-end against an actual torch-SERIALIZED ``.pth`` file: save a
    reference-layout state_dict with ``torch.save``, run the converter CLI
    (``main()``, exactly what a user invokes on a released checkpoint —
    reference trained_models/DOWNLOAD.sh ships .pth+.yaml pairs), restore
    the .msgpack with flax ``from_bytes`` the way
    ``DreamNetwork.load_network_params`` does, and check inference parity
    with the torch forward.  This covers the torch (de)serialization +
    file-IO legs the in-memory tests above skip — after this, the only
    unexercised step toward real-checkpoint parity is the real data itself.
    """
    import convert_torch_weights
    from flax import serialization

    torch.manual_seed(2)
    tmodel = _torch_hourglass(n_keypoints=3)
    tmodel.eval()
    pth_path = tmp_path / "reference_ckpt.pth"
    # Reference checkpoints are plain torch.save'd state_dicts
    # (reference dream/network.py:608-616 torch.save(state_dict())).
    torch.save(tmodel.state_dict(), str(pth_path))

    out_path = tmp_path / "converted.msgpack"
    argv = sys.argv
    try:
        sys.argv = [
            "convert_torch_weights.py",
            "-i", str(pth_path), "-a", "vgg", "-o", str(out_path),
        ]
        convert_torch_weights.main()
    finally:
        sys.argv = argv
    assert out_path.exists() and out_path.stat().st_size > 0

    fmodel = DreamHourglass(n_keypoints=3)
    x = np.random.RandomState(3).rand(1, 3, 64, 64).astype(np.float32)
    template = fmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    restored = serialization.from_bytes(template, out_path.read_bytes())
    restored = jax.tree_util.tree_map(jnp.asarray, restored)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()
    f_out = fmodel.apply(restored, jnp.asarray(x.transpose(0, 2, 3, 1)))[0]
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(f_out), -1, 1), t_out, atol=2e-4
    )


def test_dataparallel_prefix_stripped():
    tmodel = _torch_hourglass(n_keypoints=2)
    sd = {"module." + k: v for k, v in tmodel.state_dict().items()}
    variables = convert_vgg(sd)
    assert "down1" in variables["params"]


def _torch_resnet_simple(n_keypoints=2, layers=(1, 1, 1, 1)):
    """Plain-torch twin of ResnetSimple with torchvision-style key names."""

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class TorchResnetSimple(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            inplanes = 64

            def make_layer(planes, blocks, stride):
                nonlocal inplanes
                downsample = nn.Sequential(
                    nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )
                mods = [Bottleneck(inplanes, planes, stride, downsample)]
                inplanes = planes * 4
                for _ in range(1, blocks):
                    mods.append(Bottleneck(inplanes, planes))
                return nn.Sequential(*mods)

            self.layer1 = make_layer(64, layers[0], 1)
            self.layer2 = make_layer(128, layers[1], 2)
            self.layer3 = make_layer(256, layers[2], 2)
            self.layer4 = make_layer(512, layers[3], 2)

            ups = []
            for i in range(4):
                in_ch = 2048 if i == 0 else 256
                ups += [
                    nn.ConvTranspose2d(in_ch, 256, 4, 2, 1),
                    nn.BatchNorm2d(256),
                    nn.ReLU(inplace=True),
                ]
            ups.append(nn.Conv2d(256, n_keypoints, 1))
            self.upsample = nn.Sequential(*ups)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.upsample(x)

    return TorchResnetSimple()


def _add_full_decoder(tmodel, n_keypoints):
    """Swap in the full-variant decoder: reference dream/models.py:80-136 —
    ``upsample`` keeps only the 4 deconv blocks (no head) and ``upsample2``
    is (ConvTranspose=0, BatchNorm=1, ReLU=2, Conv2d=3)."""
    ups = list(tmodel.upsample.children())[:-1]  # drop the 1x1 head
    tmodel.upsample = nn.Sequential(*ups)
    tmodel.upsample2 = nn.Sequential(
        nn.ConvTranspose2d(256, 256, 4, 2, 1),
        nn.BatchNorm2d(256),
        nn.ReLU(inplace=True),
        nn.Conv2d(256, n_keypoints, 1),
    )
    def forward_full(x):
        x = tmodel.maxpool(tmodel.relu(tmodel.bn1(tmodel.conv1(x))))
        x = tmodel.layer4(tmodel.layer3(tmodel.layer2(tmodel.layer1(x))))
        return tmodel.upsample2(tmodel.upsample(x))

    tmodel.forward = forward_full
    return tmodel


def test_resnet_full_conversion_value_parity():
    """Full-variant (dream_resnet_f) head lives at upsample2.3, not .4."""
    from convert_torch_weights import convert_resnet
    from dream_tpu.models import ResnetSimple

    torch.manual_seed(3)
    layers = (1, 1, 1, 1)
    tmodel = _add_full_decoder(
        _torch_resnet_simple(n_keypoints=2, layers=layers), n_keypoints=2
    )
    tmodel.eval()

    x = np.random.RandomState(4).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()

    variables = convert_resnet(tmodel.state_dict(), layers=layers)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    fmodel = ResnetSimple(n_keypoints=2, layers=layers, full=True)
    f_out = fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         train=False)[0]
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(f_out), -1, 1), t_out, atol=3e-4
    )


def test_resnet_conversion_value_parity():
    from convert_torch_weights import convert_resnet
    from dream_tpu.models import ResnetSimple

    torch.manual_seed(0)
    layers = (1, 1, 1, 1)
    tmodel = _torch_resnet_simple(n_keypoints=2, layers=layers)
    tmodel.eval()

    x = np.random.RandomState(2).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x)).numpy()

    variables = convert_resnet(tmodel.state_dict(), layers=layers)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    fmodel = ResnetSimple(n_keypoints=2, layers=layers)
    f_out = fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         train=False)[0]
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(f_out), -1, 1), t_out, atol=3e-4
    )
