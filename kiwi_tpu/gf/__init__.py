from .store import GFStore, GFStoreBuilder  # noqa: F401
