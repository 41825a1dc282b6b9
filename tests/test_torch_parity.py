"""End-to-end 2D style-transfer parity vs a literal torch replica of the
reference loop (style_transfer.py:38-85): same VGG weights, same init, same
Adam hyperparameters — loss trajectories and outputs must track within f32
drift (SURVEY.md §4 item 5 / BASELINE 'final loss within 2%')."""

import numpy as np
import pytest
import jax.numpy as jnp

from st3d.engine.style_transfer2d import style_transfer
from st3d.models.vgg import init_random_vgg19
from st3d.ops.losses import compute_perceptual_loss

torch = pytest.importorskip("torch")


def torch_reference_style_transfer(init, content, style, seq, steps, sw, cw,
                                   lr):
    """Verbatim reimplementation of the reference's loop in torch."""
    import torch.optim as optim

    layers = {"0": "conv1_1", "5": "conv2_1", "10": "conv3_1",
              "19": "conv4_1", "21": "conv4_2", "28": "conv5_1"}

    def get_features(image):
        feats = {}
        x = image
        for name, layer in seq._modules.items():
            x = layer(x)
            if name in layers:
                feats[layers[name]] = x
        return feats

    def gram(t):
        b, d, h, w = t.size()
        t = t.view(b, d, h * w)
        return torch.bmm(t, t.transpose(1, 2))

    content_features = get_features(content)["conv4_2"].detach()
    style_features = get_features(style)
    style_grams = {l: gram(style_features[l]).detach() for l in style_features}
    style_grams.pop("conv4_2")

    optimized = init.clone().detach().requires_grad_(True)
    optimizer = optim.Adam([optimized], lr=lr)
    losses = []
    for _ in range(steps):
        feats = get_features(optimized)
        content_loss = torch.mean((feats["conv4_2"] - content_features) ** 2)
        style_loss = 0
        for layer in style_grams:
            f = feats[layer]
            g = gram(f)
            layer_loss = torch.mean((g - style_grams[layer]) ** 2)
            style_loss += layer_loss / (f.shape[1] ** 2 * f.shape[2] ** 2)
        total = cw * content_loss + sw * style_loss
        optimizer.zero_grad()
        total.backward()
        optimizer.step()
        losses.append(float(total))
    return optimized.detach(), losses


def test_style_transfer_matches_torch_reference():
    from tests.test_vgg import build_torch_vgg19_features

    model = init_random_vgg19(seed=4)
    seq = build_torch_vgg19_features(model).eval()

    rng = np.random.RandomState(7)
    content = rng.rand(1, 3, 32, 32).astype(np.float32)
    style = rng.rand(1, 3, 32, 32).astype(np.float32)
    steps, sw, cw, lr = 12, 1e6, 1.0, 0.02

    torch_out, torch_losses = torch_reference_style_transfer(
        torch.from_numpy(content), torch.from_numpy(content),
        torch.from_numpy(style), seq, steps, sw, cw, lr,
    )

    ours = style_transfer(
        jnp.asarray(content), jnp.asarray(content), jnp.asarray(style),
        model, steps=steps, style_weight=sw, content_weight=cw, lr=lr,
        progress=False,
    )

    # Final images track the torch trajectory closely (f32 drift only).
    diff = np.abs(np.asarray(ours) - torch_out.numpy())
    scale = np.abs(torch_out.numpy()).max()
    assert diff.max() / scale < 5e-3, diff.max()

    # Final loss parity well inside the 2% acceptance bound: evaluate the
    # same (our) loss at each framework's final image.
    def eval_loss(img):
        return float(compute_perceptual_loss(
            jnp.asarray(img), jnp.asarray(content), jnp.asarray(style),
            model, sw, cw,
        ))

    ours_loss = eval_loss(np.asarray(ours))
    torch_loss = eval_loss(torch_out.numpy())
    rel = abs(ours_loss - torch_loss) / abs(torch_loss)
    assert rel < 0.02, (ours_loss, torch_loss)
