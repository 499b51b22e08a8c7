from . import schedules, scalings, guidance
