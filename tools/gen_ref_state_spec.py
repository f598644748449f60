"""Generate the reference checkpoint key/shape spec fixture.

Instantiates the REFERENCE torch SuRSNet (read-only mount at
/root/reference) at its default config (lib/options.py defaults: 3 LR
stacks, 1 HR stack, hg_depth 2, hg_dim 256, group norm, residual SR with
n_block [2,2,2]) and dumps every state-dict key with its shape to
tests/fixtures/ref_netG_state_spec.json.

The fixture is the committed artifact; this script only needs to run
when the reference model definition changes. torchvision (imported by
the reference's legacy ConvFilters) is stubbed out — SuRSNet itself
never uses it.
"""
import json
import os
import sys
import types

# stub torchvision and skimage before the reference package pulls them
# in (legacy ConvFilters / mesh_util imports; SuRSNet uses neither)
tv = types.ModuleType("torchvision")
tv.models = types.ModuleType("torchvision.models")
tv.models.resnet = types.ModuleType("torchvision.models.resnet")
tv.models.vgg = types.ModuleType("torchvision.models.vgg")
sk = types.ModuleType("skimage")
sk.measure = types.ModuleType("skimage.measure")
sk.measure.marching_cubes_lewiner = None
sys.modules.update({
    "torchvision": tv,
    "torchvision.models": tv.models,
    "torchvision.models.resnet": tv.models.resnet,
    "torchvision.models.vgg": tv.models.vgg,
    "skimage": sk,
    "skimage.measure": sk.measure,
})

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

from lib.options import BaseOptions  # noqa: E402

_argv = sys.argv
sys.argv = [_argv[0]]                # parse() reads sys.argv
opt = BaseOptions().parse()          # pure defaults
sys.argv = _argv
# the README commands add --residual; include it in the canonical spec
opt.residual = True
opt.loadSize = 512

from lib.model.SuRSNet import SuRSNet  # noqa: E402

net = SuRSNet(opt, projection_mode="orthogonal")
sd = net.state_dict()
spec = {k: list(v.shape) for k, v in sd.items()}
out = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "ref_netG_state_spec.json")
os.makedirs(os.path.dirname(out), exist_ok=True)
with open(out, "w") as f:
    json.dump(spec, f, indent=0, sort_keys=True)
print(f"{len(spec)} keys -> {out}")
