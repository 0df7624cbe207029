package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class PyReprSpec extends AnyFunSuite {
  test("golden: list of digit strings renders like Python str(list)") {
    // reference utils.py:36-53 docstring: ['10', '11'] -> "['10', '11']"
    assert(PyRepr.jsonToPyRepr("""["10", "11"]""") == "['10', '11']")
  }
  test("ints, floats, bools, nulls") {
    assert(PyRepr.jsonToPyRepr("""[10, 11]""") == "[10, 11]")
    assert(PyRepr.jsonToPyRepr("""[1.0, 2.5]""") == "[1.0, 2.5]")
    assert(PyRepr.jsonToPyRepr("""[true, false, null]""") == "[True, False, None]")
  }
  test("nested objects render as dicts") {
    assert(PyRepr.jsonToPyRepr("""[{"a": 1, "b": "x"}]""") == "[{'a': 1, 'b': 'x'}]")
  }
  test("string quoting follows Python repr rules") {
    assert(PyRepr.reprString("it's") == "\"it's\"")
    assert(PyRepr.reprString("both ' and \"") == "'both \\' and \"'")
    assert(PyRepr.reprString("plain") == "'plain'")
  }
  test("null cell stays null") {
    assert(PyRepr.jsonToPyRepr(null) == null)
  }
}
