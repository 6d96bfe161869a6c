"""load_model backbones beyond ResNet-50 (reference src/utils.py:68-124):
vgg11, densenet121, and the per-checkpoint key-layout quirks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.pyramid import (
    densenet121_features,
    densenet121_from_torch,
    densenet121_init,
    load_model,
    resnet50_init,
    vgg11_features,
    vgg11_from_torch,
    vgg11_init,
)

RNG = np.random.default_rng(7)


def test_vgg11_matches_torch_sequential():
    """Forward math vs a torch conv/pool stack built from the same weights."""
    torch = pytest.importorskip("torch")

    params = jax.device_get(vgg11_init(jax.random.PRNGKey(0)))
    layers, ci, in_ch = [], 0, 3
    from depthg_tpu.models.pyramid import _VGG11_CFG

    for v in _VGG11_CFG:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            conv = torch.nn.Conv2d(in_ch, v, 3, padding=1)
            conv.weight.data = torch.from_numpy(np.asarray(params["convs"][ci]["w"]))
            conv.bias.data = torch.from_numpy(np.asarray(params["convs"][ci]["b"]))
            layers += [conv, torch.nn.ReLU(inplace=True)]
            in_ch, ci = v, ci + 1
    tnet = torch.nn.Sequential(*layers).eval()

    x = RNG.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()
    got = np.asarray(vgg11_features(jax.device_put(params), jnp.asarray(x)))
    assert got.shape == (2, 512, 2, 2)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_vgg11_converter_roundtrip():
    torch = pytest.importorskip("torch")

    params = jax.device_get(vgg11_init(jax.random.PRNGKey(1)))
    # torchvision vgg11 feature indices: convs at 0,3,6,8,11,13,16,18
    idxs = (0, 3, 6, 8, 11, 13, 16, 18)
    sd = {}
    for i, conv in zip(idxs, params["convs"]):
        sd[f"features.{i}.weight"] = torch.from_numpy(np.asarray(conv["w"]))
        sd[f"features.{i}.bias"] = torch.from_numpy(np.asarray(conv["b"]))
    restored = vgg11_from_torch(sd)
    x = jnp.asarray(RNG.standard_normal((1, 3, 32, 32)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(vgg11_features(jax.device_put(params), x)),
        np.asarray(vgg11_features(jax.device_put(restored), x)), atol=0)


@pytest.mark.slow
def test_densenet121_structure_and_roundtrip():
    torch = pytest.importorskip("torch")

    params = jax.device_get(densenet121_init(jax.random.PRNGKey(2)))
    x = jnp.asarray(RNG.standard_normal((1, 3, 64, 64)).astype(np.float32))
    out = densenet121_features(jax.device_put(params), x)
    assert out.shape == (1, 1024, 2, 2)

    # torchvision key layout round-trip
    def put_bn(sd, prefix, bn):
        sd[prefix + ".weight"] = torch.from_numpy(np.asarray(bn["g"]))
        sd[prefix + ".bias"] = torch.from_numpy(np.asarray(bn["b"]))
        sd[prefix + ".running_mean"] = torch.from_numpy(np.asarray(bn["mean"]))
        sd[prefix + ".running_var"] = torch.from_numpy(np.asarray(bn["var"]))

    sd = {"features.conv0.weight": torch.from_numpy(np.asarray(params["conv0"]["w"]))}
    put_bn(sd, "features.norm0", params["norm0"])
    for bi, block in enumerate(params["blocks"], start=1):
        for li, layer in enumerate(block, start=1):
            p = f"features.denseblock{bi}.denselayer{li}"
            put_bn(sd, p + ".norm1", layer["norm1"])
            sd[p + ".conv1.weight"] = torch.from_numpy(np.asarray(layer["conv1"]["w"]))
            put_bn(sd, p + ".norm2", layer["norm2"])
            sd[p + ".conv2.weight"] = torch.from_numpy(np.asarray(layer["conv2"]["w"]))
    for ti, tr in enumerate(params["transitions"], start=1):
        put_bn(sd, f"features.transition{ti}.norm", tr["norm"])
        sd[f"features.transition{ti}.conv.weight"] = torch.from_numpy(
            np.asarray(tr["conv"]["w"]))
    put_bn(sd, "features.norm5", params["norm5"])

    restored = densenet121_from_torch(sd)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(densenet121_features(jax.device_put(restored), x)), atol=0)


def test_densenet_layer_matches_torch():
    """BN-ReLU-Conv bottleneck + concat semantics vs torch primitives."""
    torch = pytest.importorskip("torch")

    params = jax.device_get(densenet121_init(jax.random.PRNGKey(3)))
    layer = params["blocks"][0][0]
    x = RNG.standard_normal((1, 64, 8, 8)).astype(np.float32)

    bn1 = torch.nn.BatchNorm2d(64).eval()
    bn1.weight.data = torch.from_numpy(np.asarray(layer["norm1"]["g"]))
    bn1.bias.data = torch.from_numpy(np.asarray(layer["norm1"]["b"]))
    bn1.running_mean.data = torch.from_numpy(np.asarray(layer["norm1"]["mean"]))
    bn1.running_var.data = torch.from_numpy(np.asarray(layer["norm1"]["var"]))
    conv1 = torch.nn.Conv2d(64, 128, 1, bias=False)
    conv1.weight.data = torch.from_numpy(np.asarray(layer["conv1"]["w"]))
    bn2 = torch.nn.BatchNorm2d(128).eval()
    bn2.weight.data = torch.from_numpy(np.asarray(layer["norm2"]["g"]))
    bn2.bias.data = torch.from_numpy(np.asarray(layer["norm2"]["b"]))
    bn2.running_mean.data = torch.from_numpy(np.asarray(layer["norm2"]["mean"]))
    bn2.running_var.data = torch.from_numpy(np.asarray(layer["norm2"]["var"]))
    conv2 = torch.nn.Conv2d(128, 32, 3, padding=1, bias=False)
    conv2.weight.data = torch.from_numpy(np.asarray(layer["conv2"]["w"]))
    with torch.no_grad():
        t = torch.from_numpy(x)
        want = conv2(torch.relu(bn2(conv1(torch.relu(bn1(t)))))).numpy()

    from depthg_tpu.models.pyramid import batch_norm
    from depthg_tpu.models.zoedepth.layers import conv2d

    h = conv2d(layer["conv1"], jax.nn.relu(batch_norm(layer["norm1"], jnp.asarray(x))))
    got = np.asarray(conv2d(layer["conv2"],
                            jax.nn.relu(batch_norm(layer["norm2"], h)), padding=1))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_load_model_key_quirks(tmp_path):
    """robust_resnet50 / mocov2 / densecl checkpoint layouts all load."""
    torch = pytest.importorskip("torch")

    from depthg_tpu.models.pyramid import resnet50_activations

    params = jax.device_get(resnet50_init(jax.random.PRNGKey(4)))

    # plain torchvision layout
    sd = {}

    def put_bn(prefix, bn):
        sd[prefix + ".weight"] = torch.from_numpy(np.asarray(bn["g"]))
        sd[prefix + ".bias"] = torch.from_numpy(np.asarray(bn["b"]))
        sd[prefix + ".running_mean"] = torch.from_numpy(np.asarray(bn["mean"]))
        sd[prefix + ".running_var"] = torch.from_numpy(np.asarray(bn["var"]))

    sd["conv1.weight"] = torch.from_numpy(np.asarray(params["conv1"]["w"]))
    put_bn("bn1", params["bn1"])
    for li, layer in enumerate(params["layers"], start=1):
        for bi, blk in enumerate(layer):
            p = f"layer{li}.{bi}"
            for ci in (1, 2, 3):
                sd[f"{p}.conv{ci}.weight"] = torch.from_numpy(np.asarray(blk[f"conv{ci}"]["w"]))
                put_bn(f"{p}.bn{ci}", blk[f"bn{ci}"])
            if "down" in blk:
                sd[f"{p}.downsample.0.weight"] = torch.from_numpy(
                    np.asarray(blk["down"]["conv"]["w"]))
                put_bn(f"{p}.downsample.1", blk["down"]["bn"])

    x = jnp.asarray(RNG.standard_normal((1, 3, 32, 32)).astype(np.float32))
    want = np.asarray(resnet50_activations(jax.device_put(params), x, (7,))[7])

    # resnet50 (plain file)
    torch.save(sd, tmp_path / "resnet50-0676ba61.pth")
    p, fn, nf = load_model("resnet50", str(tmp_path))
    assert nf == 2048
    np.testing.assert_allclose(np.asarray(fn(jax.device_put(p), x)), want, atol=0)

    # robust_resnet50: {"model": {"module.model." + k}}
    torch.save({"model": {"module.model." + k: v for k, v in sd.items()}},
               tmp_path / "imagenet_l2_3_0.pt")
    p, fn, _ = load_model("robust_resnet50", str(tmp_path))
    np.testing.assert_allclose(np.asarray(fn(jax.device_put(p), x)), want, atol=0)

    # mocov2: {"state_dict": {"module.encoder_q." + k}} (+ fc entries skipped)
    moco = {"module.encoder_q." + k: v for k, v in sd.items()}
    moco["module.encoder_q.fc.weight"] = torch.zeros(10, 2048)
    torch.save({"state_dict": moco}, tmp_path / "moco_v2_800ep_pretrain.pth.tar")
    p, fn, _ = load_model("mocov2", str(tmp_path))
    np.testing.assert_allclose(np.asarray(fn(jax.device_put(p), x)), want, atol=0)

    # densecl: plain under state_dict
    torch.save({"state_dict": sd}, tmp_path / "densecl_r50_coco_1600ep.pth")
    p, fn, _ = load_model("densecl", str(tmp_path))
    np.testing.assert_allclose(np.asarray(fn(jax.device_put(p), x)), want, atol=0)
