package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the quote- and paren-aware statement scanners the
  * GRAFT SQL surface splits on — the cases a regex split misfires on
  * (keywords inside string literals, parens inside quotes, nesting). */
class GraftSqlParserSpec extends AnyFunSuite {
  import GraftSqlParser.{matchingParen, topLevelIndexOfWord}

  test("topLevelIndexOfWord: literal and paren occurrences don't count") {
    assert(topLevelIndexOfWord("a = 1 WHERE b = 2", "WHERE") == 6)
    assert(topLevelIndexOfWord("note = 'a where b' WHERE id = 1", "WHERE") == 19)
    assert(topLevelIndexOfWord("x = (SELECT 1 WHERE true) WHERE y", "WHERE") == 26)
    assert(topLevelIndexOfWord("a = 'no trailing clause'", "WHERE") == -1)
  }

  test("topLevelIndexOfWord: case-insensitive, word-bounded") {
    assert(topLevelIndexOfWord("a = 1 where b", "WHERE") == 6)
    // NOWHERE / WHEREX must not match
    assert(topLevelIndexOfWord("a = NOWHERE", "WHERE") == -1)
    assert(topLevelIndexOfWord("a = WHEREX", "WHERE") == -1)
    assert(topLevelIndexOfWord("WHERE x", "WHERE") == 0)
  }

  test("matchingParen: nesting and quoted parens") {
    assert(matchingParen("(a)", 0) == 2)
    assert(matchingParen("(a (b) c)", 0) == 8)
    assert(matchingParen("(SELECT ') ON x' AS t) ON id", 0) == 21)
    assert(matchingParen("(unbalanced", 0) == -1)
    assert(matchingParen("no paren", 0) == -1)
  }
}
