"""Schema-matched torch Vocos (the published charactr/vocos-mel-24khz
state-dict layout) — a first-party stand-in for the ``vocos`` pip package.

Used by tools/dump_real_weight_goldens.py to load the published
pytorch_model.bin WITHOUT the vocos package installed, and by
tests/test_full_scale_parity.py + tests/test_goldens_rehearsal.py to prove
the converter against the exact key schema
(reference zipvoice/bin/infer_zipvoice.py:301-312 loads this checkpoint via
``Vocos.from_pretrained("charactr/vocos-mel-24khz")``).
"""

import torch


class TorchConvNeXtBlock(torch.nn.Module):
    """Replicates vocos.models.ConvNeXtBlock (arXiv:2303.00748, package
    layout: dwconv/norm/pwconv1/pwconv2/gamma)."""

    def __init__(self, dim, intermediate_dim, layer_scale_init_value):
        super().__init__()
        self.dwconv = torch.nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = torch.nn.Linear(dim, intermediate_dim)
        self.act = torch.nn.GELU()
        self.pwconv2 = torch.nn.Linear(intermediate_dim, dim)
        self.gamma = torch.nn.Parameter(
            layer_scale_init_value * torch.ones(dim)
        )

    def forward(self, x):  # (B, C, T)
        residual = x
        x = self.dwconv(x)
        x = x.transpose(1, 2)
        x = self.norm(x)
        x = self.pwconv1(x)
        x = self.act(x)
        x = self.pwconv2(x)
        x = self.gamma * x
        x = x.transpose(1, 2)
        return residual + x


class TorchVocos(torch.nn.Module):
    """vocos package layout: backbone.embed / backbone.norm /
    backbone.convnext.{i} / backbone.final_layer_norm / head.out, iSTFT
    head with exp-magnitude clip at 1e2 (vocos.heads.ISTFTHead)."""

    MEL24K = dict(n_mels=100, dim=512, intermediate_dim=1536,
                  num_layers=8, n_fft=1024, hop=256)

    def __init__(self, n_mels, dim, intermediate_dim, num_layers, n_fft,
                 hop):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop
        backbone = torch.nn.Module()
        backbone.embed = torch.nn.Conv1d(n_mels, dim, 7, padding=3)
        backbone.norm = torch.nn.LayerNorm(dim, eps=1e-6)
        backbone.convnext = torch.nn.ModuleList(
            TorchConvNeXtBlock(dim, intermediate_dim, 1.0 / num_layers)
            for _ in range(num_layers)
        )
        backbone.final_layer_norm = torch.nn.LayerNorm(dim, eps=1e-6)
        self.backbone = backbone
        head = torch.nn.Module()
        head.out = torch.nn.Linear(dim, n_fft + 2)
        self.head = head

    @classmethod
    def from_checkpoint(cls, path: str, **cfg) -> "TorchVocos":
        """Load a published-schema state dict (pytorch_model.bin)."""
        m = cls(**(cfg or cls.MEL24K))
        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
        # the published file may carry feature-extractor buffers; keep
        # only backbone/head weights
        sd = {k: v for k, v in sd.items()
              if k.startswith(("backbone.", "head."))}
        m.load_state_dict(sd)
        m.eval()
        return m

    def forward(self, mel):  # (B, n_mels, T) -> (B, n)
        x = self.backbone.embed(mel)
        x = self.backbone.norm(x.transpose(1, 2)).transpose(1, 2)
        for blk in self.backbone.convnext:
            x = blk(x)
        x = self.backbone.final_layer_norm(x.transpose(1, 2))
        x = self.head.out(x).transpose(1, 2)
        mag, p = x.chunk(2, dim=1)
        mag = torch.exp(mag).clip(max=1e2)
        S = mag * (torch.cos(p) + 1j * torch.sin(p))
        window = torch.hann_window(self.n_fft)
        return torch.istft(
            S,
            self.n_fft,
            self.hop,
            self.n_fft,
            window,
            center=True,
            length=mel.shape[-1] * self.hop,
        )

    @torch.no_grad()
    def decode(self, mel):
        """vocos package API: Vocos.decode(mel (B, n_mels, T)) -> wav."""
        return self.forward(mel)
