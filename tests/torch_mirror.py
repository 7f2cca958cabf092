"""Compact torch mirror of the Xception architecture, used ONLY as a parity
oracle in tests (BASELINE.md: per-frame logits must match the PyTorch reference
within fp32 tolerance, and checkpoints use the reference's key names).

Written config-driven from the architecture spec shared with
``models/xception.py``; the module/key naming (conv1, bn1, blockN.rep.i,
skip/skipbn, conv3/conv4, fc) follows the reference checkpoint format
(``/root/reference/Xception.py``) so the importer's key-pattern logic is tested
against realistic state_dicts.
"""
import torch
import torch.nn as nn

from multimodal_deepfake_detection_tpu.models.xception import XCEPTION_BLOCK_SPECS


class MirrorSep(nn.Module):
    def __init__(self, ci, co, k=3, stride=1, pad=1):
        super().__init__()
        self.conv1 = nn.Conv2d(ci, ci, k, stride, pad, groups=ci, bias=False)
        self.pointwise = nn.Conv2d(ci, co, 1, bias=False)

    def forward(self, x):
        return self.pointwise(self.conv1(x))


class MirrorBlock(nn.Module):
    def __init__(self, spec):
        super().__init__()
        ci, co, reps, stride, start_relu, grow_first = spec
        if grow_first:
            chans = [(ci, co)] + [(co, co)] * (reps - 1)
        else:
            chans = [(ci, ci)] * (reps - 1) + [(ci, co)]
        layers = []
        for j, (a, b) in enumerate(chans):
            if j > 0 or start_relu:
                layers.append(nn.ReLU())
            layers.append(MirrorSep(a, b))
            layers.append(nn.BatchNorm2d(b))
        if stride != 1:
            layers.append(nn.MaxPool2d(3, stride, 1))
        self.rep = nn.Sequential(*layers)
        if co != ci or stride != 1:
            self.skip = nn.Conv2d(ci, co, 1, stride=stride, bias=False)
            self.skipbn = nn.BatchNorm2d(co)
        else:
            self.skip = None

    def forward(self, x):
        out = self.rep(x)
        if self.skip is not None:
            return out + self.skipbn(self.skip(x))
        return out + x


class MirrorXception(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 3, 2, 0, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.conv2 = nn.Conv2d(32, 64, 3, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        for i, spec in enumerate(XCEPTION_BLOCK_SPECS):
            setattr(self, f"block{i + 1}", MirrorBlock(spec))
        self.conv3 = MirrorSep(1024, 1536)
        self.bn3 = nn.BatchNorm2d(1536)
        self.conv4 = MirrorSep(1536, 2048)
        self.bn4 = nn.BatchNorm2d(2048)
        self.fc = nn.Linear(2048, num_classes) if num_classes else None

    def forward(self, x, features_only=False):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        for i in range(len(XCEPTION_BLOCK_SPECS)):
            x = getattr(self, f"block{i + 1}")(x)
        x = torch.relu(self.bn3(self.conv3(x)))
        x = torch.relu(self.bn4(self.conv4(x)))
        x = torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)
        if features_only or self.fc is None:
            return x
        return self.fc(x)
