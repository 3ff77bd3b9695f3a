from sr.utils.config import SRConfig  # noqa: F401
