from . import colorfix, image
