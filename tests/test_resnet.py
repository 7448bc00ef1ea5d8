"""ResNet bottleneck blocks, torch state-dict import, and
reference-semantics (resnet50 layer4) Grad-CAM — all validated against
independent torch oracles with the torchvision layout.

Covers VERDICT items 2-3: a user's real smp/torchvision .pth weights
must reproduce the deployed reference's features and heatmaps
(/root/reference/WebApplicationPrototype/app.py:78-94, GRADCAM.py:16-53).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cadx_tpu.models import resnet, unet
from cadx_tpu.xai import gradcam


# The resnet/encoder convs deliberately run at DEFAULT MXU precision (the
# throughput-critical path; ops/conv.py keeps HIGHEST only for the
# bit-faithful classifier). A single bf16 MXU pass drifts ~6e-3 absolute
# vs torch f32, so on the real TPU the oracle tolerance widens; CPU (and
# the classifier parity suites) stay tight.
_CONV_ATOL = 1e-4 if jax.default_backend() != "tpu" else 2e-2



# ---------------------------------------------------------------------------
# torch oracles (torchvision module/key layout, independent implementation)
# ---------------------------------------------------------------------------

def _torch_resnet(torch, block="bottleneck", layers=(2, 2, 2, 2),
                  widths=(16, 32, 64, 128), in_channels=3, num_classes=None,
                  seed=0):
    """Small torchvision-layout resnet whose state_dict keys match the real
    ones (conv1/bn1/layer{i}.{j}.conv*/downsample.0/1/fc)."""
    nn = torch.nn
    torch.manual_seed(seed)

    class BasicBlock(nn.Module):
        def __init__(self, cin, w, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, w, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.conv2 = nn.Conv2d(w, w, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(w)
            self.downsample = None
            if stride != 1 or cin != w:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, w, 1, stride, bias=False), nn.BatchNorm2d(w))
            self.out_ch = w

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idn)

    class Bottleneck(nn.Module):
        # torchvision v1.5 semantics: stride on the 3x3, expansion 4
        def __init__(self, cin, w, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, w, 1, 1, 0, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.conv2 = nn.Conv2d(w, w, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(w)
            self.conv3 = nn.Conv2d(w, 4 * w, 1, 1, 0, bias=False)
            self.bn3 = nn.BatchNorm2d(4 * w)
            self.downsample = None
            if stride != 1 or cin != 4 * w:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, 4 * w, 1, stride, bias=False),
                    nn.BatchNorm2d(4 * w))
            self.out_ch = 4 * w

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = torch.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return torch.relu(out + idn)

    Block = BasicBlock if block == "basic" else Bottleneck

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cin = 64
            stages = []
            for si, (w, n) in enumerate(zip(widths, layers)):
                blocks = []
                for bi in range(n):
                    b = Block(cin, w, 2 if (si > 0 and bi == 0) else 1)
                    blocks.append(b)
                    cin = b.out_ch
                stages.append(nn.Sequential(*blocks))
            self.layer1, self.layer2, self.layer3, self.layer4 = stages
            if num_classes is not None:
                self.avgpool = nn.AdaptiveAvgPool2d(1)
                self.fc = nn.Linear(cin, num_classes)
            self._has_fc = num_classes is not None

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            if self._has_fc:
                x = self.fc(torch.flatten(self.avgpool(x), 1))
            return x

    net = Net()
    # randomize bn running stats so the bn path is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    net.eval()
    return net


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# import + forward parity
# ---------------------------------------------------------------------------

def test_bottleneck_state_dict_import_matches_torch():
    torch = pytest.importorskip("torch")
    net = _torch_resnet(torch, "bottleneck", num_classes=10)
    cfg, params = resnet.params_from_state_dict(net.state_dict())
    assert cfg.block == "bottleneck"
    assert cfg.layers == (2, 2, 2, 2) and cfg.widths == (16, 32, 64, 128)
    assert cfg.num_classes == 10 and cfg.expansion == 4

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    feats = resnet.stage_features(params, jnp.asarray(x), cfg)
    logits = resnet.forward(params, jnp.asarray(x), cfg)

    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t = net.conv1(tx)
        np.testing.assert_allclose(np.asarray(feats[0]), _nhwc(t), atol=_CONV_ATOL)
        t = net.maxpool(net.relu(net.bn1(t)))
        np.testing.assert_allclose(np.asarray(feats[3]), _nhwc(t), atol=_CONV_ATOL)
        t = net.layer2(net.layer1(t))
        np.testing.assert_allclose(np.asarray(feats[5]), _nhwc(t), atol=_CONV_ATOL)
        t = net.layer4(net.layer3(t))
        np.testing.assert_allclose(np.asarray(feats[7]), _nhwc(t), atol=_CONV_ATOL)
        tl = net(tx).numpy()
    np.testing.assert_allclose(np.asarray(logits), tl, atol=_CONV_ATOL)


def test_basic_state_dict_import_smp_prefix_feeds_engine_encoder():
    """smp.Unet state dicts hold the resnet under 'encoder.'; the import
    must strip it and the result must drop into the serving engine's
    feature extractor (unet.resnet_encoder_features layout)."""
    torch = pytest.importorskip("torch")
    net = _torch_resnet(torch, "basic", layers=(2, 2, 2, 2),
                        widths=(64, 96, 128, 160), in_channels=1)
    sd = {f"encoder.{k}": v for k, v in net.state_dict().items()}
    sd["decoder.blocks.0.conv1.0.weight"] = torch.zeros(1)  # smp noise key
    cfg, params = resnet.encoder_params_from_state_dict(sd)
    assert cfg.block == "basic" and cfg.in_channels == 1
    assert cfg.num_classes is None

    x = np.random.default_rng(1).standard_normal((1, 64, 64, 1)).astype(np.float32)
    # both the resnet module and the unet encoder consume the pytree
    feats_r = resnet.stage_features(params, jnp.asarray(x), cfg)
    feats_u = unet.resnet_encoder_features(params, jnp.asarray(x))
    with torch.no_grad():
        tx = torch.tensor(x.transpose(0, 3, 1, 2))
        t = net.conv1(tx)
        ref0 = _nhwc(t)
        ref_last = _nhwc(net.layer4(net.layer3(net.layer2(net.layer1(
            net.maxpool(net.relu(net.bn1(t))))))))
    np.testing.assert_allclose(np.asarray(feats_r[0]), ref0, atol=_CONV_ATOL)
    np.testing.assert_allclose(np.asarray(feats_u[0]), ref0, atol=_CONV_ATOL)
    np.testing.assert_allclose(np.asarray(feats_r[-1]), ref_last, atol=_CONV_ATOL)
    np.testing.assert_allclose(np.asarray(feats_u[-1]), ref_last, atol=_CONV_ATOL)


def test_load_state_dict_file_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    net = _torch_resnet(torch, "basic", layers=(1, 1, 1, 1),
                        widths=(8, 8, 8, 8), in_channels=1)
    path = str(tmp_path / "enc.pth")
    torch.save(net.state_dict(), path)
    cfg, params = resnet.encoder_params_from_state_dict(path)
    assert cfg.layers == (1, 1, 1, 1)
    np.testing.assert_allclose(
        np.asarray(params["conv1"]["kernel"]),
        net.conv1.weight.detach().numpy().transpose(2, 3, 1, 0), atol=0)


def test_init_resnet50_shapes():
    cfg = resnet.RESNET50_CLASSIFIER
    params = resnet.init_resnet(jax.random.key(0), cfg)
    assert params["stages"][0][0]["conv3"]["kernel"].shape == (1, 1, 64, 256)
    assert params["fc"]["kernel"].shape == (2048, 1000)
    x = jnp.zeros((1, 64, 64, 3))
    logits = resnet.forward(params, x, cfg)
    assert logits.shape == (1, 1000)


# ---------------------------------------------------------------------------
# reference Grad-CAM parity (GRADCAM.py semantics vs torch autograd oracle)
# ---------------------------------------------------------------------------

def _torch_gradcam(torch, net, input_tensor, class_idx):
    """Minimal independent pytorch-grad-cam GradCAM: hook layer4 output,
    weights = GAP of grads, cam = relu(sum w*A), min-max scale."""
    acts = {}
    h1 = net.layer4.register_forward_hook(
        lambda m, i, o: acts.__setitem__("a", o))
    logits = net(input_tensor)
    h1.remove()
    a = acts["a"]
    g = torch.autograd.grad(logits[0, class_idx], a)[0]
    w = g.mean(dim=(2, 3), keepdim=True)
    cam = torch.relu((w * a).sum(dim=1))[0].detach().numpy()
    return (cam - cam.min()) / (cam.max() - cam.min() + 1e-7)


def test_resnet50_gradcam_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    net = _torch_resnet(torch, "bottleneck", num_classes=5, seed=3)
    cfg, params = resnet.params_from_state_dict(net.state_dict())

    img = np.random.default_rng(2).integers(0, 256, (96, 96)).astype(np.uint8)
    # reference preprocessing (GRADCAM.py:24-28, :46-50)
    x = gradcam.imagenet_input_from_gray(jnp.asarray(img))
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2), requires_grad=True)

    for class_idx in (0, 1):
        ours = np.asarray(gradcam.resnet_gradcam_map(params, x, class_idx, cfg))
        ref = _torch_gradcam(torch, net, tx, class_idx)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_resnet50_gradcam_heatmap_matches_pygradcam_pipeline():
    """End-to-end heatmap oracle mirroring pytorch-grad-cam's FULL
    pipeline: scale_cam_image at feature res -> cv2 bilinear resize ->
    scale_cam_image AGAIN (the second renorm a round-2 review found
    missing — bilinear output of a [0,1] map has min>0/max<1)."""
    torch = pytest.importorskip("torch")
    import cv2

    net = _torch_resnet(torch, "bottleneck", num_classes=5, seed=5)
    cfg, params = resnet.params_from_state_dict(net.state_dict())
    img = np.random.default_rng(4).integers(0, 256, (96, 96)).astype(np.uint8)
    x = gradcam.imagenet_input_from_gray(jnp.asarray(img))
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2), requires_grad=True)

    for class_idx in (0, 1):
        _, hm = gradcam.resnet_gradcam_overlay(
            params, jnp.asarray(img), class_idx, cfg, (96, 96))
        cam = _torch_gradcam(torch, net, tx, class_idx)
        big = cv2.resize(cam.astype(np.float32), (96, 96),
                         interpolation=cv2.INTER_LINEAR)
        big = big - big.min()
        big = big / (1e-7 + big.max())
        ref = (big * 255).astype(np.uint8)
        diff = np.abs(np.asarray(hm).astype(int) - ref.astype(int))
        assert diff.max() <= 2, diff.max()


def test_reference_gradcam_overlay_files(tmp_path):
    torch = pytest.importorskip("torch")
    net = _torch_resnet(torch, "bottleneck", num_classes=5, seed=4)
    cfg, params = resnet.params_from_state_dict(net.state_dict())
    img = np.random.default_rng(3).integers(0, 256, (64, 64)).astype(np.uint8)
    out = gradcam.generate_reference_gradcam_overlays(
        params, cfg, img, (0, 1), str(tmp_path))
    for c in (0, 1):
        ov, hm = out[c]
        assert ov.shape == (64, 64, 3) and ov.dtype == np.uint8
        assert hm.shape == (64, 64) and hm.dtype == np.uint8
        assert (tmp_path / f"gradcam_overlay_class_{c}.png").exists()
        assert (tmp_path / f"gradcam_heatmap_class_{c}.png").exists()
    # show_cam_on_image contract: overlay = u8(255 * (jet(cam)+img)/max)
    assert out[0][0].max() == 255


def test_engine_accepts_encoder_and_gradcam_pth(tmp_path):
    """End-to-end: user drops .pth files, engine reproduces pretrained
    features + reference CAM path."""
    torch = pytest.importorskip("torch")
    from cadx_tpu.serve.engine import EngineConfig, InferenceEngine

    enc = _torch_resnet(torch, "basic", layers=(1, 1, 1, 1),
                        widths=(8, 8, 8, 8), in_channels=1, seed=5)
    r50 = _torch_resnet(torch, "bottleneck", layers=(1, 1, 1, 1),
                        widths=(8, 8, 8, 8), num_classes=4, seed=6)
    enc_path = str(tmp_path / "enc.pth")
    cam_path = str(tmp_path / "r50.pth")
    torch.save({f"encoder.{k}": v for k, v in enc.state_dict().items()}, enc_path)
    torch.save(r50.state_dict(), cam_path)

    # an encoder-only (fc-less) .pth passed as gradcam_pth must fail at
    # STARTUP with a clear message, not 500 on the first request
    with pytest.raises(ValueError, match="fc"):
        InferenceEngine(EngineConfig(segment_hw=(64, 64), feature_resize=(8, 8)),
                        gradcam_pth=enc_path)

    engine = InferenceEngine(
        EngineConfig(segment_hw=(64, 64), feature_resize=(8, 8)),
        encoder_pth=enc_path, gradcam_pth=cam_path)
    # encoder conv1 weights are the imported ones
    np.testing.assert_allclose(
        np.asarray(engine.encoder_params["conv1"]["kernel"]),
        enc.conv1.weight.detach().numpy().transpose(2, 3, 1, 0), atol=0)

    img = np.random.default_rng(4).integers(0, 256, (80, 72)).astype(np.uint8)
    feats, clean = engine.process_single_image(img)
    assert feats.shape == (64, 32, 32)

    out = engine.write_gradcam_overlays(
        feats, np.random.default_rng(5).integers(0, 256, (64, 64)).astype(np.uint8),
        str(tmp_path / "xai"), (0, 1))
    assert set(out) == {0, 1}
