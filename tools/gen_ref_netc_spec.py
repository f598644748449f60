"""Generate the reference netC (ResBlkPIFuNet) key/shape spec fixture.

The reference's own BasePIFuNet.py was deleted upstream (only a stale
.pyc remains), so a minimal stand-in is injected before import — it only
has to satisfy the constructor; state_dict structure comes entirely from
ResBlkPIFuNet itself.
"""
import json
import os
import sys
import types

import torch.nn as tnn

# stub torchvision (pulled in by the package __init__'s legacy imports)
tv = types.ModuleType("torchvision")
tv.models = types.ModuleType("torchvision.models")
tv.models.resnet = types.ModuleType("torchvision.models.resnet")
tv.models.vgg = types.ModuleType("torchvision.models.vgg")
sys.modules.update({
    "torchvision": tv,
    "torchvision.models": tv.models,
    "torchvision.models.resnet": tv.models.resnet,
    "torchvision.models.vgg": tv.models.vgg,
})

base_mod = types.ModuleType("lib.model.BasePIFuNet")


class BasePIFuNet(tnn.Module):
    def __init__(self, projection_mode="orthogonal", error_term=None):
        super().__init__()
        self.projection_mode = projection_mode
        self.error_term = error_term


base_mod.BasePIFuNet = BasePIFuNet
sys.modules["lib.model.BasePIFuNet"] = base_mod

sk = types.ModuleType("skimage")
sk.measure = types.ModuleType("skimage.measure")
sk.measure.marching_cubes_lewiner = None
sys.modules.update({"skimage": sk, "skimage.measure": sk.measure})

sys.path.insert(0, "/root/reference")

from lib.options import BaseOptions  # noqa: E402

_argv = sys.argv
sys.argv = [_argv[0]]
opt = BaseOptions().parse()
sys.argv = _argv

from lib.model.ResBlkPIFuNet import ResBlkPIFuNet  # noqa: E402

net = ResBlkPIFuNet(opt)
spec = {k: list(v.shape) for k, v in net.state_dict().items()}
out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "ref_netC_state_spec.json")
with open(out, "w") as f:
    json.dump(spec, f, indent=0, sort_keys=True)
print(f"{len(spec)} keys -> {out}")
