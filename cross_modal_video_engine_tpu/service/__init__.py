from .app import EngineService, create_server
