"""Dump golden tensors from the reference implementation for parity tests.

Runs the reference PyTorch code at /root/reference (read-only) and saves:
  - golden_dataset.npz : samples [0, 1, 7, 123] of the demo-config dataset
    (reference dataset.py defaults with num_samples=500 etc.), for bit-match
    tests of our NumPy generator;
  - golden_model.npz   : the reference model's state_dict (demo config,
    d_model=128, seed 0) + eval-mode forward outputs (separated, masks) and
    per-module intermediates on sample batches, for weight-transplant allclose
    tests;
  - golden_loss.npz    : SI-SNR / SeparationLoss values on fixed tensors.

The resulting .npz files are committed under tests/golden/ so the test suite
never needs to import the reference.  Run from the repo root:
    python tools/make_golden.py
"""

import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/src")
sys.path.insert(0, "/root/reference")

from av_separation import AVSeparationTransformer, SyntheticAVDataset  # noqa: E402
from av_separation.losses import SeparationLoss, si_snr  # noqa: E402

OUT = "tests/golden"
SAMPLE_IDS = [0, 1, 7, 123]


def dump_dataset():
    ds = SyntheticAVDataset(
        num_samples=500, sample_rate=8000, duration=1.0, n_fft=512,
        hop_length=128, num_frames=25, frame_h=32, frame_w=32,
        speaker_freqs=(220.0, 440.0),
    )
    out = {}
    for i in SAMPLE_IDS:
        s = ds[i]
        out[f"mixed_spec_{i}"] = s["mixed_spec"].numpy()
        out[f"lip_frames_{i}"] = s["lip_frames"].numpy()
        out[f"clean_specs_{i}"] = s["clean_specs"].numpy()
    np.savez_compressed(f"{OUT}/golden_dataset.npz", **out)
    print("dataset golden:", {k: v.shape for k, v in out.items()})
    return ds


def dump_model(ds):
    torch.manual_seed(0)
    model = AVSeparationTransformer(
        freq_bins=257, d_model=128, nhead=4, num_encoder_layers=2,
        num_fusion_layers=2, num_speakers=2, dropout=0.1,
    )
    model.eval()

    batch = [ds[i] for i in SAMPLE_IDS]
    mixed = torch.stack([b["mixed_spec"] for b in batch])       # (4, 257, 63)
    frames = torch.stack([b["lip_frames"] for b in batch])      # (4, 50, 32, 32)
    targets = torch.stack([b["clean_specs"] for b in batch])    # (4, 2, 257, 63)

    with torch.no_grad():
        t = mixed.shape[-1]
        audio_emb = model.audio_encoder(mixed)
        visual_emb = model.visual_encoder(frames, t)
        fused = model.fusion(audio_emb, visual_emb)
        masks = model.decoder(fused)
        separated = model.decoder.separate(masks, mixed)

    out = {
        "mixed": mixed.numpy(),
        "frames": frames.numpy(),
        "targets": targets.numpy(),
        "audio_emb": audio_emb.numpy(),
        "visual_emb": visual_emb.numpy(),
        "fused": fused.numpy(),
        "masks": masks.numpy(),
        "separated": separated.numpy(),
    }
    state = {f"w::{k}": v.detach().numpy()
             for k, v in model.state_dict().items()}
    np.savez_compressed(f"{OUT}/golden_model.npz", **out, **state)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"model golden: {len(state)} weight arrays, {n_params} params")

    # Loss goldens on the same tensors.
    crit = SeparationLoss(l1_weight=0.5)
    loss_val = crit(separated, targets).item()
    loss_swapped = crit(separated[:, [1, 0]], targets).item()
    snr_self = si_snr(targets, targets).item()
    snr_est = si_snr(separated, targets).item()
    rng = np.random.default_rng(3)
    a = torch.from_numpy(rng.normal(size=(4, 2, 65, 32)).astype(np.float32))
    b = torch.from_numpy(rng.normal(size=(4, 2, 65, 32)).astype(np.float32))
    np.savez(
        f"{OUT}/golden_loss.npz",
        loss=loss_val, loss_swapped=loss_swapped,
        snr_self=snr_self, snr_est=snr_est,
        rand_a=a.numpy(), rand_b=b.numpy(),
        rand_si_snr=si_snr(a, b).item(),
        rand_loss=SeparationLoss(0.5)(a, b).item(),
    )
    print(f"loss golden: loss={loss_val:.6f} snr_est={snr_est:.4f}")


if __name__ == "__main__":
    ds = dump_dataset()
    dump_model(ds)
