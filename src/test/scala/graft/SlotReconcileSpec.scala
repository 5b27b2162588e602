package graft

import graft.model.Lsn
import graft.sources.SlotReconcile
import graft.sources.SlotReconcile._
import org.scalatest.funsuite.AnyFunSuite

/** Truth table port of slot.rs:196-250 (reconcile_resume). */
class SlotReconcileSpec extends AnyFunSuite {

  private val l100 = Lsn(100)
  private val l200 = Lsn(200)

  test("slot with confirmed LSN: start at confirmed, boundary = max(disk, confirmed)") {
    val slot = Some(Some(SlotState(Some(l100), Some(Lsn(50)), active = false)))
    val r1 = SlotReconcile.reconcile(Some(l200), slot)
    assert(r1 == Resume(Some(l100), Some(l200), FromSlot))
    val r2 = SlotReconcile.reconcile(Some(Lsn(10)), slot)
    assert(r2 == Resume(Some(l100), Some(l100), FromSlot))
  }

  test("slot exists but no confirmed LSN: dedup from disk") {
    val slot = Some(Some(SlotState(None, None, active = false)))
    assert(SlotReconcile.reconcile(Some(l100), slot) ==
      Resume(Some(l100), Some(l100), FromSlot))
    assert(SlotReconcile.reconcile(None, slot) == Resume(None, None, FromSlot))
  }

  test("slot deleted: fall back to disk checkpoint") {
    assert(SlotReconcile.reconcile(Some(l100), Some(None)) ==
      Resume(Some(l100), Some(l100), SlotDeletedFallback))
  }

  test("query failed: fall back to disk checkpoint") {
    assert(SlotReconcile.reconcile(Some(l100), None) ==
      Resume(Some(l100), Some(l100), QueryFailedFallback))
  }

  test("nothing anywhere: fresh start") {
    assert(SlotReconcile.reconcile(None, Some(None)) == Resume(None, None, Fresh))
    assert(SlotReconcile.reconcile(None, None) == Resume(None, None, Fresh))
  }

  test("unsigned LSN ordering") {
    assert(Lsn(-1L) > Lsn(Long.MaxValue)) // top bit set = larger unsigned
  }
}
