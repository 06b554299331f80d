"""Web seismosizer (counterpart of web/cgi-bin/seismograms.pl)."""

from .server import SeismogramApp, serve

__all__ = ["SeismogramApp", "serve"]
