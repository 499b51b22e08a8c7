from .controller import Controller
from .worker import Worker
from .web import WebServer
from .cli import ChatSession
from .engine import DecodeEngine
from .llm_worker import LLMWorker
