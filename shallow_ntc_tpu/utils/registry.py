"""String -> class registry (reference: common/utils.py:58-71 ClassBuilder).

The registry is part of the public config API: transform_config dicts refer to
transforms by class name (e.g. cls="ElicAnalysis").
"""


class ClassBuilder(dict):
  """dict of {class_name: class} with a kwargs-forwarding build method.

  Example:
    builder = ClassBuilder({"A": A})
    builder.build("A", arg1="x")  ->  A(arg1="x")
  """

  def build(self, class_name, **kwargs):
    if class_name not in self:
      raise KeyError(
          f"Unknown class {class_name!r}; registered: {sorted(self)}"
      )
    return self[class_name](**kwargs)

  def register(self, cls, name=None):
    """Register a class (usable as a decorator)."""
    self[name or cls.__name__] = cls
    return cls
