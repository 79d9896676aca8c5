from .sim import UipcSim, UipcSimCfg  # noqa: F401
from .objects import UipcObject, UipcObjectCfg, AffineBodyConstitutionCfg, StableNeoHookeanCfg  # noqa: F401
from .attachments import UipcIsaacAttachments, UipcIsaacAttachmentsCfg  # noqa: F401
