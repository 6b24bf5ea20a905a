"""Numerical parity vs live torch modules (torch-cpu is in the image).

This substitutes for activation-parity testing against the released
checkpoints (SURVEY.md §7 stage 5): we build the torch primitives the
reference composes (``nn.MultiheadAttention`` with ``add_zero_attn``,
``nn.TransformerEncoderLayer``), convert their weights with
``train.checkpoint`` and assert our flax modules match to float tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mixermdm_tpu.models.layers import TorchMultiheadAttention
from mixermdm_tpu.models.torch_compat import TorchEncoder, TorchEncoderLayer
from mixermdm_tpu.train import checkpoint as ck

E, H, B, T = 32, 4, 2, 7


def sd_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestMHAParity:
    @pytest.mark.parametrize("add_zero_attn", [True, False])
    def test_self_attention(self, add_zero_attn):
        torch.manual_seed(0)
        m = torch.nn.MultiheadAttention(E, H, batch_first=True, add_zero_attn=add_zero_attn)
        m.eval()
        x = torch.randn(B, T, E)
        want, _ = m(x, x, x, need_weights=False)

        params = ck.convert_mha({f"attn.{k}": v for k, v in sd_np(m).items()}, "attn")
        ours = TorchMultiheadAttention(E, H, add_zero_attn=add_zero_attn)
        got = ours.apply({"params": params}, jnp.asarray(x.numpy()), jnp.asarray(x.numpy()), jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)

    def test_key_padding_mask(self):
        torch.manual_seed(1)
        m = torch.nn.MultiheadAttention(E, H, batch_first=True, add_zero_attn=True)
        m.eval()
        x = torch.randn(B, T, E)
        kpm = torch.zeros(B, T, dtype=torch.bool)
        kpm[:, -3:] = True
        want, _ = m(x, x, x, key_padding_mask=kpm, need_weights=False)

        params = ck.convert_mha({f"a.{k}": v for k, v in sd_np(m).items()}, "a")
        ours = TorchMultiheadAttention(E, H)
        got = ours.apply(
            {"params": params},
            jnp.asarray(x.numpy()), jnp.asarray(x.numpy()), jnp.asarray(x.numpy()),
            jnp.asarray(kpm.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)

    def test_cross_attention_kdim(self):
        KD = 48
        torch.manual_seed(2)
        m = torch.nn.MultiheadAttention(E, H, kdim=KD, vdim=KD, batch_first=True,
                                        add_zero_attn=True)
        m.eval()
        q = torch.randn(B, T, E)
        kv = torch.randn(B, 5, KD)
        want, _ = m(q, kv, kv, need_weights=False)

        params = ck.convert_mha({f"a.{k}": v for k, v in sd_np(m).items()}, "a")
        ours = TorchMultiheadAttention(E, H, kdim=KD, vdim=KD)
        got = ours.apply(
            {"params": params},
            jnp.asarray(q.numpy()), jnp.asarray(kv.numpy()), jnp.asarray(kv.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=2e-5)


class TestEncoderParity:
    def test_encoder_layer(self):
        torch.manual_seed(3)
        m = torch.nn.TransformerEncoderLayer(
            d_model=E, nhead=H, dim_feedforward=E * 2, dropout=0.0,
            activation="gelu", batch_first=True,
        )
        m.eval()
        x = torch.randn(B, T, E)
        with torch.no_grad():
            want = m(x)

        params = ck.convert_torch_encoder_layer(
            {f"l.{k}": v for k, v in sd_np(m).items()}, "l"
        )
        ours = TorchEncoderLayer(E, H, E * 2)
        got = ours.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)

    def test_full_encoder(self):
        torch.manual_seed(4)
        layer = torch.nn.TransformerEncoderLayer(
            d_model=E, nhead=H, dim_feedforward=E * 2, dropout=0.0,
            activation="gelu", batch_first=True,
        )
        m = torch.nn.TransformerEncoder(layer, num_layers=2)
        m.eval()
        x = torch.randn(B, T, E)
        kpm = torch.zeros(B, T, dtype=torch.bool)
        kpm[:, -2:] = True
        with torch.no_grad():
            want = m(x, src_key_padding_mask=kpm)

        params = ck.convert_torch_encoder(
            {f"e.{k}": v for k, v in sd_np(m).items()}, "e", 2
        )
        ours = TorchEncoder(E, H, E * 2, 2)
        got = ours.apply({"params": params}, jnp.asarray(x.numpy()), jnp.asarray(kpm.numpy()))
        # torch's fast path zeroes *padded* rows outright (a nested-tensor
        # optimisation); downstream consumers mask those rows anyway, so
        # parity is asserted on the valid positions only.
        np.testing.assert_allclose(
            np.asarray(got)[:, :-2], want.numpy()[:, :-2], atol=5e-5
        )


class TestEmbeddingParity:
    def test_sinusoidal_table(self):
        from mixermdm_tpu.models.embeddings import sinusoidal_table

        d, L = 32, 50
        pe = torch.zeros(L, d)
        position = torch.arange(0, L, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(torch.arange(0, d, 2).float() * (-np.log(10000.0) / d))
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        np.testing.assert_allclose(
            np.asarray(sinusoidal_table(L, d)), pe.numpy(), atol=5e-6
        )
