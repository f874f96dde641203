from .timing import Timer, RateMeter
