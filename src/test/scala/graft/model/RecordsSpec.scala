package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Pure-model semantics, mirroring the reference's unit tests
  * (test/scala/mediation/MediationServiceSpec.scala:85-120).
  */
class RecordsSpec extends AnyFunSuite {

  test("idempotent key formats as tx-custId (MediationServiceSpec:99)") {
    assert(MockData.notSentDebitQuique.idempotentKey == "unique_kcop-1")
    assert(MockData.notSentDebitAbuela.idempotentKey == "unique_abu-2")
  }

  test("idempotent key renders missing fields as 'null' (negative case)") {
    assert(MockData.invalidRecord.idempotentKey == "null-null")
  }

  test("validity: all three mandatory fields required (MyEventRecordUtils:15-25)") {
    assert(MockData.notSentDebitQuique.isValid)
    assert(!MockData.invalidRecord.isValid)
    val noCust = MockData.notSentDebitQuique.copy(customer = Customer(None, Some("x")))
    assert(!noCust.isValid)
  }

  test("initial-load tagging round-trips (MyEventRecordUtils:57-65)") {
    val tagged = MockData.notSentDebitQuique.tagInitialLoad
    assert(tagged.isInitialLoad)
    assert(tagged.event.id.contains("INITIAL_LOAD_11"))
    assert(!MockData.notSentDebitQuique.isInitialLoad)
  }

  test("retry increment: null→0, n→n+1 (MyEventRecordUtils:120-131)") {
    assert(MockData.notSentDebitQuique.incRetries.notification.retries.contains(0))
    val r1 = MockData.notSentDebitQuique.incRetries.incRetries
    assert(r1.notification.retries.contains(1))
  }

  test("success enrichment sets flag/descr/retries (MyEventRecordUtils:81-118)") {
    val ok = MockData.notSentDebitQuique.withSuccess(success = true, "SUCESSFUL PUSH")
    assert(ok.notification.nhubSuccess.contains(true))
    assert(ok.notification.successDescr.contains("SUCESSFUL PUSH"))
    assert(ok.notification.retries.contains(0))
  }

  test("response success sniff: error/ko in body => failure (MyHttpResponse:19-27)") {
    assert(NotificationResponse(101, "t", "all good", 1).isSuccess)
    assert(!NotificationResponse(101, "t", "some ERROR happened", 1).isSuccess)
    assert(!NotificationResponse.ko("timeout").isSuccess)
    // the dedup marker is not an error response
    assert(NotificationResponse.SentOrDuplicated.isSuccess)
  }

  test("HttpRequest built from record fields (NotificationFactory:8-13)") {
    val req = HttpRequest.from(MockData.notSentDebitQuique)
    assert(req.title == "DEBIT_PURCHASE")
    assert(req.userId == 1)
    assert(req.body.startsWith("tienes un cargo de 101.0"))
  }
}
