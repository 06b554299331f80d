from . import build

build(verbose=True)
