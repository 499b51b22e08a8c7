from .controller import Controller
from .worker import Worker
from .web import WebServer
from .cli import ChatSession
