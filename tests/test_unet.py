"""U-Net family parity tests: TinyUNet vs Keras oracle, ResNet encoder vs
torchvision resnet34, general UNet behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cadx_tpu.models import unet


# The resnet/encoder convs deliberately run at DEFAULT MXU precision (the
# throughput-critical path; ops/conv.py keeps HIGHEST only for the
# bit-faithful classifier). A single bf16 MXU pass drifts ~6e-3 absolute
# vs torch f32, so on the real TPU the oracle tolerance widens; CPU (and
# the classifier parity suites) stay tight.
_CONV_ATOL = 1e-4 if jax.default_backend() != "tpu" else 2e-2
# deeper stages compound the per-conv bf16 drift through bn/relu chains
_CONV_ATOL_L2 = 1e-3 if jax.default_backend() != "tpu" else 5e-2
_CONV_ATOL_L4 = 1e-2 if jax.default_backend() != "tpu" else 1e-1



def test_tiny_unet_matches_keras(rng):
    tf = pytest.importorskip("tensorflow")
    from tensorflow.keras import layers, models

    # Keras oracle with the reference tiny_unet architecture
    # (Classes/Preprocessing.py:176-204)
    inputs = layers.Input(shape=(32, 32, 1))
    c1 = layers.Conv2D(16, 3, activation="relu", padding="same")(inputs)
    p1 = layers.MaxPooling2D()(c1)
    c2 = layers.Conv2D(32, 3, activation="relu", padding="same")(p1)
    p2 = layers.MaxPooling2D()(c2)
    bn = layers.Conv2D(64, 3, activation="relu", padding="same", name="bottleneck")(p2)
    u1 = layers.UpSampling2D()(bn)
    c3 = layers.Conv2D(32, 3, activation="relu", padding="same")(u1)
    u2 = layers.UpSampling2D()(c3)
    c4 = layers.Conv2D(16, 3, activation="relu", padding="same")(u2)
    outputs = layers.Conv2D(1, 1, activation="sigmoid", padding="same")(c4)
    keras_model = models.Model(inputs, outputs)

    params = unet.init_tiny_unet(jax.random.key(0))
    # push our weights into keras (Conv2D kernels share HWIO layout)
    name_map = ["c1", "c2", "bottleneck", "c3", "c4", "out"]
    conv_layers = [l for l in keras_model.layers if isinstance(l, layers.Conv2D)]
    for lyr, ours in zip(conv_layers, name_map):
        lyr.set_weights([np.asarray(params[ours]["kernel"]),
                         np.asarray(params[ours]["bias"])])

    x = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    ref = keras_model.predict(x, verbose=0)
    ours = np.asarray(unet.tiny_unet_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # bottleneck extractor contract
    bneck_model = models.Model(keras_model.input,
                               keras_model.get_layer("bottleneck").output)
    ref_bn = bneck_model.predict(x, verbose=0)
    ours_bn = np.asarray(unet.tiny_unet_bottleneck(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours_bn, ref_bn, atol=1e-5)
    assert ours_bn.shape == (2, 8, 8, 64)


def test_tiny_unet_autoencoder_trains(rng):
    import optax

    params = unet.init_tiny_unet(jax.random.key(1))
    # smooth, structured images (random noise is unlearnable for a tiny AE)
    yy, xx = np.mgrid[0:16, 0:16] / 16.0
    base = np.stack([0.5 + 0.4 * np.sin(3 * xx + p) * np.cos(2 * yy + p)
                     for p in np.linspace(0, 3, 8)])[..., None]
    x = jnp.asarray(base, jnp.float32)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, x):
        loss, grads = jax.value_and_grad(unet.tiny_unet_mse)(params, x)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = train_step(params, opt_state, x)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]


def _torch_resnet34(torch):
    """Independent torch implementation of the resnet34 encoder layout
    (conv1 7x7/2 + bn + relu + maxpool3/2, BasicBlock stages [3,4,6,3] at
    widths [64,128,256,512]) used as a cross-framework oracle."""
    nn = torch.nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout),
                )

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = torch.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return torch.relu(out + idn)

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(1, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            widths, layers, cin = [64, 128, 256, 512], [3, 4, 6, 3], 64
            stages = []
            for si, (w, n) in enumerate(zip(widths, layers)):
                blocks = []
                for bi in range(n):
                    blocks.append(BasicBlock(cin, w, 2 if (si > 0 and bi == 0) else 1))
                    cin = w
                stages.append(nn.Sequential(*blocks))
            self.layer1, self.layer2, self.layer3, self.layer4 = stages

    return Enc()


def test_resnet_encoder_matches_torch_oracle(rng):
    torch = pytest.importorskip("torch")

    tmodel = _torch_resnet34(torch)
    # randomize bn running stats so the bn path is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    tmodel.eval()

    params = unet.init_resnet_encoder(jax.random.key(0))

    # copy torch weights -> our pytree (OIHW -> HWIO)
    def cp(t):
        return jnp.asarray(t.detach().numpy().transpose(2, 3, 1, 0))

    params["conv1"]["kernel"] = cp(tmodel.conv1.weight)
    params["bn1"] = {
        "scale": jnp.asarray(tmodel.bn1.weight.detach().numpy()),
        "bias": jnp.asarray(tmodel.bn1.bias.detach().numpy()),
        "mean": jnp.asarray(tmodel.bn1.running_mean.numpy()),
        "var": jnp.asarray(tmodel.bn1.running_var.numpy()),
    }
    tstages = [tmodel.layer1, tmodel.layer2, tmodel.layer3, tmodel.layer4]
    for si, tstage in enumerate(tstages):
        for bi, tblock in enumerate(tstage):
            b = params["stages"][si][bi]
            b["conv1"]["kernel"] = cp(tblock.conv1.weight)
            b["conv2"]["kernel"] = cp(tblock.conv2.weight)
            for bn_name, tbn in [("bn1", tblock.bn1), ("bn2", tblock.bn2)]:
                b[bn_name] = {
                    "scale": jnp.asarray(tbn.weight.detach().numpy()),
                    "bias": jnp.asarray(tbn.bias.detach().numpy()),
                    "mean": jnp.asarray(tbn.running_mean.numpy()),
                    "var": jnp.asarray(tbn.running_var.numpy()),
                }
            if tblock.downsample is not None:
                b["downsample"]["kernel"] = cp(tblock.downsample[0].weight)
                tbn = tblock.downsample[1]
                b["downsample"]["bn"] = {
                    "scale": jnp.asarray(tbn.weight.detach().numpy()),
                    "bias": jnp.asarray(tbn.bias.detach().numpy()),
                    "mean": jnp.asarray(tbn.running_mean.numpy()),
                    "var": jnp.asarray(tbn.running_var.numpy()),
                }

    x = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)
    feats = unet.resnet_encoder_features(params, jnp.asarray(x))

    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        t = tmodel.conv1(tx)
        ref_conv1 = t.numpy().transpose(0, 2, 3, 1)
        t2 = tmodel.maxpool(tmodel.relu(tmodel.bn1(t)))
        t3 = tmodel.layer1(t2)
        t4 = tmodel.layer2(t3)
        ref_l2 = t4.numpy().transpose(0, 2, 3, 1)
        t5 = tmodel.layer4(tmodel.layer3(t4))
        ref_l4 = t5.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(feats[0]), ref_conv1, atol=_CONV_ATOL)
    np.testing.assert_allclose(np.asarray(feats[5]), ref_l2, atol=_CONV_ATOL_L2)
    np.testing.assert_allclose(np.asarray(feats[7]), ref_l4, atol=_CONV_ATOL_L4)
    assert feats[0].shape == (1, 32, 32, 64)  # /2 spatial, 64ch contract


def test_encoder_first_features_contract():
    """512x512 input -> (256, 256, 64): the app's segmentation-mask shape
    (app.py:148, squeezed to (64, 256, 256) in CHW)."""
    params = unet.init_resnet_encoder(jax.random.key(0))
    img = jnp.zeros((1, 512, 512, 1), jnp.float32)
    out = unet.encoder_first_features(params, img)
    assert out.shape == (1, 256, 256, 64)


def test_unet_general_shapes_and_training(rng):
    import optax

    config = unet.UNetConfig(features=(8, 16, 32))
    params = unet.init_unet(jax.random.key(0), config)
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    y = (x > 0.5).astype(jnp.float32)
    out = unet.unet_apply(params, x, config)
    assert out.shape == (2, 32, 32, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def bce(params, x, y):
        p = jnp.clip(unet.unet_apply(params, x, config), 1e-6, 1 - 1e-6)
        return -jnp.mean(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))

    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(bce)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = train_step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]
