from .store import NATIVE_AVAILABLE, load_bundle, save_bundle
