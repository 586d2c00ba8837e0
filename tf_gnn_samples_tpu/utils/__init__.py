from .iterators import ThreadedIterator  # noqa: F401
from .registry import name_to_model_class, name_to_task_class, restore  # noqa: F401
