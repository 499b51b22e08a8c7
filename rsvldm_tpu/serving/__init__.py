from .controller import Controller
from .worker import Worker
