package graft

import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {
  test("CLI argument parsing: file, repeated params, errors") {
    val ok = Main.parse(List("run", "-f", "p.yml", "-p", "a=1", "-p", "b=x=y"), Main.CliArgs())
    assert(ok == Right(Main.CliArgs(file = "p.yml", params = Map("a" -> "1", "b" -> "x=y"))))
    assert(Main.parse(List("run"), Main.CliArgs()).isLeft)             // missing -f
    assert(Main.parse(List("-f", "p.yml", "-p", "nope"), Main.CliArgs()).isLeft)
    assert(Main.parse(List("--bogus"), Main.CliArgs()).isLeft)
    assert(Main.parse(List("run", "-f", "p.yml", "--validate-only"), Main.CliArgs()) ==
      Right(Main.CliArgs(file = "p.yml", validateOnly = true)))
  }

  test("CLI argument parsing: serve mode with port and api key") {
    assert(Main.parse(List("serve"), Main.CliArgs()) ==
      Right(Main.CliArgs(mode = "serve"))) // no -f required; default port 3031
    assert(Main.parse(List("serve", "--port", "9town"), Main.CliArgs()).isLeft)
    assert(Main.parse(List("serve", "--port", "9099", "--api-key", "k"), Main.CliArgs()) ==
      Right(Main.CliArgs(mode = "serve", port = 9099, apiKey = Some("k"))))
  }
}
